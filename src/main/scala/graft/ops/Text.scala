package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis and dedup column kernels for the training-data pipeline:
  * tokenization, shingling, MinHash signatures, LSH band keys — all pure
  * Catalyst expressions (codegen'd, no UDFs), so they run inside
  * whole-stage codegen and scale by partitioning alone.
  *
  * Hashing is md5-based on purpose: md5 is bit-identical across Spark,
  * DuckDB and every other engine, which makes the MinHash/LSH pipeline
  * oracle-checkable end-to-end (xxhash64 seeds differ across engines).
  * At 100 TB the md5-vs-xxhash cost difference is dwarfed by the shuffle
  * the bucketing saves.
  */
object Text {

  /** Whitespace tokens of trimmed text (empty text → single empty token,
    * callers filter by `size >= n` where it matters). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** "BPE-ish" regex tokens: letter runs, digit runs, or single symbols. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Distinct word n-gram shingles (space-joined). Docs shorter than n
    * tokens get an empty array — the guard matters because Spark's
    * `sequence(1, 0)` counts DOWN rather than returning empty. */
  def wordShingles(toks: Column, n: Int): Column = {
    val gram = (i: Column) =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)), gram)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature: k independent permutations simulated by seeded
    * md5; each signature element is the lexicographic min hex digest over
    * the shingle set (uniform under md5 — Broder's shingle→minhash
    * construction). Null elements for empty shingle sets. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(shingles, x => md5(concat_ws(":", s, x)))))

  /** LSH band keys from a MinHash signature: `bands` keys, each hashing
    * `rows` consecutive signature slots. Docs sharing any band key are
    * near-dup candidates; the band join is an equi-join (shuffle on the
    * band key), never a cross product — the property that makes MinHash
    * LSH the 100 TB dedup path. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|", b,
        array_join(slice(sig, b * lit(rows) + lit(1), lit(rows)), "|"))))
}
