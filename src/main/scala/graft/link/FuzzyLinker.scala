package graft.link

import graft.core.Rng
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy mention → entity candidate generation and scoring
  * (north_star: "candidate generation via broadcast-dictionary lookup
  * plus MinHash-LSH blocking, entity-link scoring as a scored broadcast
  * hash join").
  *
  * Exact hits resolve through a broadcast equi-join on the normalized
  * surface form; everything else goes through character-trigram MinHash
  * banding (LSH blocking — near-linear candidate generation) and is
  * verified with exact trigram Jaccard, keeping the best entity per
  * mention. The entity side is a dimension → always broadcast.
  */
object FuzzyLinker {

  private def norm(c: org.apache.spark.sql.Column) =
    lower(regexp_replace(c, "[^a-zA-Z0-9]+", " "))

  /** Trigram-set signature + banding, computed per partition. */
  private def signatures(df: DataFrame, idCol: String, textCol: String,
                         nHashes: Int, shingle: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("string"), norm(col(textCol))).as[(String, String)]
      .mapPartitions { it =>
        val seeds = Array.tabulate(nHashes)(i => Rng.mix(0xf022eedL, i))
        it.map { case (id, text) =>
          val sig = Array.fill(nHashes)(Long.MaxValue)
          val t = s" $text "
          var i = 0
          val limit = math.max(t.length - shingle + 1, 1)
          while (i < limit) {
            val base = Rng.hashString(t.substring(i, math.min(i + shingle, t.length)))
            var j = 0
            while (j < nHashes) {
              val h = Rng.mix(seeds(j), base)
              if (h < sig(j)) sig(j) = h
              j += 1
            }
            i += 1
          }
          (id, sig)
        }
      }.toDF(idCol, "signature")
  }

  /** mentions(mention_id, text) × entities(entity_id, name) →
    * (mention_id, entity_id, score, method).
    */
  def link(mentions: DataFrame, entities: DataFrame,
           nHashes: Int = 32, bands: Int = 8, shingle: Int = 3,
           minJaccard: Double = 0.4)(implicit spark: SparkSession): DataFrame = {
    val m = mentions.select(col("mention_id"), norm(col("text")).as("m_norm"))
    val e = entities.select(col("entity_id"), norm(col("name")).as("e_norm"))

    // 1. exact: scored broadcast hash join on the normalized form
    val exact = m.join(broadcast(e), m("m_norm") === e("e_norm"))
      .select(col("mention_id"), col("entity_id"), lit(1.0).as("score"),
        lit("exact").as("method"))

    // 2. fuzzy: LSH blocking for the rest
    val unresolved = m.join(broadcast(e), m("m_norm") === e("e_norm"), "left_anti")
    val bandExpr = (sigCol: String) => posexplode(expr(
      s"transform(sequence(0, $bands - 1), b -> hash(slice($sigCol, " +
        s"b * (size($sigCol) div $bands) + 1, size($sigCol) div $bands)))"))

    val mSig = signatures(unresolved.withColumnRenamed("m_norm", "text"),
      "mention_id", "text", nHashes, shingle)
      .select(col("mention_id"), bandExpr("signature").as(Seq("band", "bh")))
    val eSig = signatures(entities.withColumn("text", col("name")),
      "entity_id", "text", nHashes, shingle)
      .select(col("entity_id"), bandExpr("signature").as(Seq("band", "bh")))

    val candidates = mSig.join(broadcast(eSig), Seq("band", "bh"))
      .select("mention_id", "entity_id").distinct()

    // exact trigram-jaccard verification of candidates
    val grams = (c: org.apache.spark.sql.Column) => array_distinct(expr(
      s"transform(sequence(1, greatest(length($c) - ${shingle - 1}, 1)), " +
        s"i -> substring($c, i, $shingle))"))
    val mg = unresolved.select(col("mention_id"), grams(col("m_norm")).as("mg"))
    val eg = e.select(col("entity_id"), grams(col("e_norm")).as("eg"))
    val w = Window.partitionBy("mention_id").orderBy(desc("score"), asc("entity_id"))
    val fuzzy = candidates.join(mg, Seq("mention_id")).join(broadcast(eg), Seq("entity_id"))
      .withColumn("score",
        expr("size(array_intersect(mg, eg)) / size(array_union(mg, eg))"))
      .where(col("score") >= minJaccard)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("mention_id"), col("entity_id"), col("score"),
        lit("minhash_lsh").as("method"))

    exact.unionByName(fuzzy)
  }
}
