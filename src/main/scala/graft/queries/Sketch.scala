package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import QueryUtil._

/** The production MinHash sketch shared by the batch near-dup operators
  * (q24p, q53) and the streaming incremental dedup
  * (streaming.StreamingExtract.nearDedupStream): 16 xxhash64-seeded
  * minhashes over distinct word-3-gram shingles, banded 8×2 with the
  * band signature compacted to one 64-bit key (the S-curve midpoint of
  * 8×2 sits at J≈0.29, so recall at the 0.5 decision threshold is high
  * and the exact-Jaccard verify removes every false candidate — the
  * rationale measured in BENCH.md "Scale-path quality").
  *
  * All expressions are codegen'd column functions — changing them here
  * changes q24p/q53, whose DuckDB oracles (exact all-pairs Jaccard)
  * re-measure the hash family's recall on every driver run.
  */
object Sketch {

  val NumHashes = 16
  val Bands = 8

  /** Cheap precondition equivalent to "has ≥1 shingle" (≥3 tokens),
    * deliberately NOT `size(shingles) > 0`: a pushed-down filter on the
    * derived column would inline the whole shingle pipeline into the
    * scan filter and evaluate it twice (the q24/q60 plan pathology).
    */
  val hasShingles: Column = col("text").rlike("\\S+\\s+\\S+\\s+\\S+")

  /** doc_id → (hsh: sorted distinct shingle hashes — the exact-verify
    * input; sigs: the 16 minhashes). Callers materialize the result
    * (localCheckpoint / a signature table) so the shingle pipeline runs
    * once per document ever.
    */
  def sketch(docs: DataFrame): DataFrame = docs
    .where(hasShingles)
    .withColumn("toks", tokens(col("text")))
    .select(col("doc_id"), shingles3(col("toks")).as("shingles"))
    .select(col("doc_id"),
      array_sort(transform(col("shingles"), x => xxhash64(x))).as("hsh"),
      transform(sequence(lit(0), lit(NumHashes - 1)),
        j => array_min(transform(col("shingles"), t => xxhash64(j, t)))).as("sigs"))

  /** Sketch rows → (doc_id, band_id, band_sig) — the LSH join key rows.
    * The shuffle carries 8 bytes of signature per (doc, band).
    */
  def bandRows(df: DataFrame): DataFrame = df
    .select(col("doc_id"), explode(sequence(lit(0), lit(Bands - 1))).as("band_id"),
      col("sigs"))
    .withColumn("band_sig",
      xxhash64(col("band_id"),
        concat_ws(",", slice(col("sigs"), col("band_id") * 2 + 1, lit(2)))))
    .select("doc_id", "band_id", "band_sig")

  /** Exact Jaccard of two sorted shingle-hash arrays via the codegen'd
    * sorted-merge intersection (register graft.plans.GraftFunctions
    * first). Single IEEE division — bit-identical across engines.
    */
  def jaccard(ha: Column, hb: Column): Column = {
    val c = call_function("sorted_intersect_count", ha, hb)
    c.cast("double") / (size(ha) + size(hb) - c).cast("double")
  }
}
