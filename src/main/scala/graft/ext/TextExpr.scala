package graft.ext

/** Shared Spark-SQL fragments for text operators — single source of
  * truth so the tokenizer/shingle definitions cannot drift between the
  * dedup, text-stats and ML modules (and their DuckDB oracle twins).
  */
object TextExpr {

  /** whitespace tokenization of `text` */
  val toksE: String = "split(trim(text), '\\\\s+')"

  /** word 3-gram shingles over a `toks` array column; empty (not
    * negative-index-throwing) for docs with fewer than 3 tokens —
    * `sequence(0, size-3)` alone is DESCENDING for size<3 under Spark's
    * sequence semantics and would throw under ANSI array indexing. */
  val shinglesE: String =
    "CASE WHEN size(toks) >= 3 THEN array_distinct(transform(" +
      "sequence(0, size(toks)-3), " +
      "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) " +
      "ELSE array() END"

  /** as [[shinglesE]] but hashing each shingle with md5 */
  val shingleMd5E: String =
    "CASE WHEN size(toks) >= 3 THEN transform(" +
      "sequence(0, size(toks)-3), " +
      "i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) " +
      "ELSE array() END"
}
