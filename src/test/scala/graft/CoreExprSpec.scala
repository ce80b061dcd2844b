package graft

import graft.core.{GraftFunctions, GraftHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden values computed with the reference algorithm
  * (pipeline/video_input/inspection_video_input.py:23-29) run under
  * CPython hashlib — independent of the Scala implementation.
  */
class CoreExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val golden = Seq(
    "vessel_00000" -> 447403L,
    "vessel_00001" -> 152757L,
    "abc" -> 320982L,
    "" -> 173934L,
    "IMO12345672023-01-15" -> 946578L,
    "hello world æøå" -> 254792L
  )

  test("detid JVM helper matches reference golden values") {
    golden.foreach { case (s, want) => assert(GraftHash.detid(s) === want, s) }
  }

  test("DetId expression (codegen path) matches golden values") {
    import spark.implicits._
    val got = golden.map(_._1).toDF("s")
      .select(GraftFunctions.detid(col("s")).as("id"))
      .as[Long].collect().toSeq
    assert(got === golden.map(_._2))
  }

  test("Sha256Hex expression matches known digest and invariant holds") {
    import spark.implicits._
    val df = Seq(("abc", "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")).toDF("content", "expected")
    val row = df.select(
      GraftFunctions.sha256_hex(col("content")).as("h"),
      GraftFunctions.sha256_invariant(col("content"), col("expected")).as("ok")
    ).collect()(0)
    assert(row.getString(0) === "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(row.getBoolean(1))
  }

  test("detid is null-safe and deterministic across invocations") {
    import spark.implicits._
    val df = Seq(Some("x"), None, Some("x")).toDF("s")
      .select(GraftFunctions.detid(col("s")).as("id"))
    val rows = df.collect()
    assert(rows(1).isNullAt(0))
    assert(rows(0).getLong(0) === rows(2).getLong(0))
  }
}
