package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM helpers shared by interpreted eval and generated code.
  * Plain object ⇒ static forwarders, so generated Java can call
  * `graft.core.GraftHash.detid(...)` directly (stays inside
  * whole-stage codegen, no virtual dispatch through closures).
  */
object GraftHash {
  private val HEX = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HEX(b >>> 4)
      out(i * 2 + 1) = HEX(b & 0x0f)
      i += 1
    }
    new String(out)
  }

  /** Deterministic id hash reproducing the reference's `detid`
    * (pipeline/video_input/inspection_video_input.py:23-29):
    * md5-hex the UTF-8 string, then
    * id = (7984002041 + Σ ord(c)·46663 over hex chars) mod 1_000_000.
    */
  def detid(s: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = hex(md.digest(s.getBytes))
    var id = 7984002041L
    var i = 0
    while (i < h.length) { id += h.charAt(i).toLong * 46663L; i += 1 }
    id % 1000000L
  }

  /** JVM-string convenience (golden-oracle + dimension derivation). */
  def detid(s: String): Long = detid(UTF8String.fromString(s))

  /** Lowercase-hex SHA-256 of the UTF-8 bytes — the per-row content
    * invariant required by BASELINE.json `input_hint`.
    */
  def sha256Hex(s: UTF8String): UTF8String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    UTF8String.fromString(hex(md.digest(s.getBytes)))
  }
}

/** `detid(str)` as a native Catalyst expression (codegen'd). */
case class DetId(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"detid expects STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "detid"

  override def nullSafeEval(v: Any): Any = GraftHash.detid(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.GraftHash.detid($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sha256_hex(str)` — SHA-256 content digest as a native Catalyst
  * expression with codegen; the invariant column of the engine.
  */
case class Sha256Hex(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"sha256_hex expects STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sha256_hex"

  override def nullSafeEval(v: Any): Any = GraftHash.sha256Hex(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.GraftHash.sha256Hex($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the custom expressions. */
object GraftFunctions {
  def detid(c: Column): Column = Bridge.column(DetId(Bridge.expression(c)))

  def sha256_hex(c: Column): Column = Bridge.column(Sha256Hex(Bridge.expression(c)))

  /** Per-row invariant check: sha256(content) equals the expected digest
    * column (BASELINE.json input_hint). Evaluates inside codegen.
    */
  def sha256_invariant(content: Column, expected: Column): Column =
    sha256_hex(content) === expected
}
