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

  /** Modulus for the arithmetic MinHash permutations (2^31 − 1, prime). */
  val MinhashP: Long = 2147483647L

  /** Engine-portable 60-bit integer hash of a string: first 15 hex digits
    * of md5, parsed as an integer. Spark computes it with `conv`, DuckDB
    * with a `0x`-prefixed cast — identical values, so every downstream
    * join/count on these hashes is oracle-checkable. */
  def baseHash(x: Column): Column =
    conv(substring(md5(x), 1, 15), 16, 10).cast("long")

  /** Per-shingle 31-bit hashes. Materialize this ONCE per row (one md5
    * per shingle) and feed [[minhashSignature]] — the k permutations are
    * then pure integer arithmetic instead of k further md5 passes
    * (measured ~4× on the bench corpus). */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, x => baseHash(x) % MinhashP)

  /** MinHash signature from pre-hashed shingles: k universal-hash
    * permutations `h → (a_s·h + b_s) mod P` (Broder's construction with a
    * Carter–Wegman family); each signature slot is the min over the
    * shingle set. Null slots for empty shingle sets. */
  def minhashSignature(hashes31: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(hashes31,
        h => ((s * 2 + 1) * h + (s * 1000003 + 12345)) % MinhashP)))

  /** Full-signature dedup key: the k-slot MinHash signature of a doc's
    * word n-gram shingle set, md5-folded to one string. Equal keys ⇔ the
    * shingle sets agree on every permutation minimum (Jaccard ≈ 1), so a
    * plain distinct/dropDuplicates on this key collapses near-dups — the
    * map-side projection behind streaming dedup-at-ingest (q101), where a
    * verification join isn't available. Callers must filter to docs with
    * ≥ n tokens first (shorter docs have empty shingle sets → null
    * signature slots and a degenerate shared key). */
  def signatureKey(toks: Column, n: Int, k: Int): Column = {
    // fold spelling, not minhashSignature(shingleHashes(...)): an HOF
    // evaluates its input array expression on EVERY outer-lambda element,
    // so the inlined composition would run the md5 pass k times per row.
    // aggregate() evaluates the hash array once and folds the k
    // permutation minima element-wise (measured ~2× on the q101 line).
    val sig = aggregate(
      shingleHashes(wordShingles(toks, n)),
      array((0 until k).map(_ => lit(MinhashP)): _*),
      (acc, h) => zip_with(
        acc,
        array((0 until k).map(s =>
          (lit(s * 2 + 1) * h + lit(s * 1000003 + 12345)) % MinhashP): _*),
        least(_, _)))
    md5(array_join(transform(sig, _.cast("string")), "|"))
  }

  /** Apply a ranked BPE merge list to a token array (the ENCODE side of
    * the q113 trainer; Sennrich et al. '16 §3.2's inference step applied
    * as one bounded pass per merge, in rank order). Returns the merged
    * token sequence joined by single spaces ("" for an empty input).
    *
    * Spelling: the token array is joined with a TWO-space separator and
    * wrapped in two spaces; merge i rewrites `" a  b "` → `" ab "`.
    * Because tokens never contain whitespace, the one-space pattern
    * margins anchor whole-token matches while leaving each neighbour
    * boundary with its other space — so after a rewrite every boundary
    * is again exactly two spaces and consecutive occurrences merge
    * greedily left-to-right, exactly the BPE scan (`replace` is
    * left-to-right non-overlapping in both Spark and DuckDB; the merged
    * token is strictly longer than its left half, so a fresh merge can
    * never re-trigger the same rule on itself). A missing merge slot
    * (fewer than `maxMerges` trained) degrades to a U+0001 control-char
    * pattern that can never match tokenized text (NOT the empty string,
    * which `replace` would insert at every position).
    *
    * All codegen'd string expressions — per-doc cost is `maxMerges`
    * linear scans of the doc, map-side only; the merge list itself is a
    * vocab-bounded model artifact the caller broadcasts. */
  def bpeApply(toks: Column, merges: Column, maxMerges: Int): Column = {
    def rep(s: Column, pat: Column, to: Column): Column =
      call_function("replace", s, pat, to)
    var s: Column = concat(lit("  "), array_join(toks, "  "), lit("  "))
    for (i <- 1 to maxMerges) {
      val pair = try_element_at(merges, lit(i)) // "a b", null when untrained
      val a = element_at(split(pair, " "), 1)
      val b = element_at(split(pair, " "), 2)
      val pat = coalesce(
        concat(lit(" "), a, lit("  "), b, lit(" ")), lit("\u0001"))
      val to = coalesce(
        concat(lit(" "), rep(pair, lit(" "), lit("")), lit(" ")), lit("\u0001"))
      s = rep(s, pat, to)
    }
    rep(trim(s), lit("  "), lit(" "))
  }

  /** LSH band keys from a MinHash signature: `bands` keys, each hashing
    * `rows` consecutive signature slots. Docs sharing any band key are
    * near-dup candidates; the band join is an equi-join (shuffle on the
    * band key), never a cross product — the property that makes MinHash
    * LSH the 100 TB dedup path. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|", b,
        array_join(
          transform(slice(sig, b * lit(rows) + lit(1), lit(rows)), _.cast("string")),
          "|"))))
}
