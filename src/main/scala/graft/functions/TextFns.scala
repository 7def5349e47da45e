package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column kernels for the LLM-pipeline extension ops.
  * All composed from built-in expressions (codegen-friendly, no UDFs);
  * each has an exact DuckDB-SQL twin used by the oracles.
  */
object TextFns {

  /** Whitespace tokens (documents.text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles: ["a b c", "b c d", ...]; empty below n. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Hashed word n-gram shingles (array<long>): xxhash64 over the n
    * consecutive tokens directly — no intermediate shingle strings.
    * Set-equivalent to hashing [[shingles]] output modulo 64-bit
    * collisions; the cheap form for Jaccard/MinHash comparisons.
    */
  def hashedShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<long>"))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => xxhash64((0 until n).map(j => element_at(toks, i + lit(j))): _*)))

  /** DuckDB twin of [[shingles]] over a list expression `toks`. */
  def shinglesSql(toks: String, n: Int): String =
    s"CASE WHEN len($toks) < $n THEN [] " +
      s"ELSE list_transform(range(1, len($toks) - ${n - 1} + 1), " +
      s"i -> array_to_string($toks[i:i+${n - 1}], ' ')) END"

  /** Exact Jaccard similarity of two DISTINCT-element arrays. Uses
    * |A∩B| / (|A|+|B|-|A∩B|) so only the intersection is materialized
    * (codegen CSE shares the repeated intersect; array_union would
    * build a second hash set).
    */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b)).cast("double")
    i / (size(a) + size(b) - i)
  }

  /** Exact Jaccard of two SORTED distinct-element array<long> columns —
    * native merge-scan intersection (graft.expressions
    * .SortedIntersectCount): no per-pair hash set, no allocation. Same
    * value as [[jaccard]]; callers array_sort once per row before the
    * pair join.
    */
  def jaccardSorted(a: Column, b: Column): Column = {
    val i = graft.expressions.GraftFunctions.sortedIntersectCount(a, b).cast("double")
    i / (size(a) + size(b) - i)
  }

  /** DuckDB twin of [[jaccard]] (inputs must be distinct-element). */
  def jaccardSql(a: String, b: String): String =
    s"(len(list_intersect($a, $b))::DOUBLE / " +
      s"(len($a) + len($b) - len(list_intersect($a, $b))))"

  /** Rolling polynomial fingerprint over tokens — deterministic 1e9+7
    * modular hash usable in both engines (no xxhash in DuckDB).
    */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => ascii(t) * lit(7L) + length(t)),
      lit(0L),
      (acc, v) => pmod(acc * 31L + v, lit(1000000007L)))

  /** DuckDB twin of [[fingerprint]] (list_reduce takes head as init, so
    * prepend the zero seed).
    */
  def fingerprintSql(toks: String): String =
    s"list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform($toks, t -> ascii(t) * 7 + length(t))), " +
      s"(acc, v) -> (acc * 31 + v) % 1000000007)"
}
