package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization and shingling as codegen'd Column transforms.
  *
  * Re-expresses the reference's tokenizer — Lua pattern `(%a+)` with
  * lowercase (`example/word-count-taskfile.lua:118-122`) — and its string
  * utilities `split`/`starts`/`ends` (`utils/utils.lua:76-109`) on Spark's
  * native expression library. Everything here returns a `Column`, so the
  * operators compose them inside whole-stage codegen.
  */
object TextFunctions {

  /** Alpha-run tokens, lowercased — the reference's `(%a+)` extract.
    * DuckDB equivalent: `regexp_extract_all(lower(x), '[a-z]+')`. */
  def alphaTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+"), lit(0))

  /** Whitespace tokens — the reference's default `string.split` pattern
    * `[^%s]+` (`utils/utils.lua:76-86`). */
  def wsTokens(c: Column): Column =
    regexp_extract_all(c, lit("[^ \\t\\n\\r]+"), lit(0))

  /** BPE-ish subword segmentation: alpha runs, digit runs, and single
    * non-alnum-non-space marks — a deterministic stand-in for a learned
    * BPE vocab with the same asymptotics (one regex scan per doc). */
  def subwordTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Word k-shingles of a token array, joined with '_'.
    * For k=3: tokens[i]_tokens[i+1]_tokens[i+2], i = 1..n-k+1 (1-based).
    *
    * IMPORTANT: `tokens` must be a BOUND column (produced by its own
    * projection, e.g. `.select(wsTokens(col("text")).as("w"))`), not an
    * inline `wsTokens(...)` expression — this builder references the
    * token array k+2 times, and an inline tokenizer expression would be
    * re-evaluated at every reference (measured ~10× slowdown). */
  def shingles(tokens: Column, k: Int): Column = {
    val n = size(tokens)
    when(n < k, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), n - lit(k - 1)),
          i => concat_ws("_", (0 until k).map(j => element_at(tokens, i + lit(j))): _*)
        ))
  }

  /** Distinct shingle set of a BOUND token-array column (the
    * MinHash/Jaccard universe). See [[shingles]] for the binding rule. */
  def shingleSet(tokens: Column, k: Int): Column =
    array_distinct(shingles(tokens, k))
}
