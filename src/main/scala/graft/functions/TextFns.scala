package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline tier (SURVEY.md §2.9) — all
  * built-in higher-order functions, so every step stays inside Catalyst
  * (codegen'd where supported, no UDFs, nothing driver-side).
  *
  * Determinism contract: every hash here is md5, whose hex output is
  * identical in Spark and DuckDB — the oracle reproduces signatures and
  * band keys bit-for-bit (SURVEY.md §7 M5 "seed everything").
  */
object TextFns {

  /** Lowercased whitespace tokens with empties dropped — the tokenizer
    * shared by wordcount, text-stats, shingling and lang-id so their
    * results compose. trim+split instead of a filter() lambda: interior
    * runs of whitespace produce no empty tokens under the \s+ regex and
    * trim removes the edge cases, so the result is identical to
    * filter(split(...), _ != "") while staying fully codegen'd (the
    * higher-order filter runs interpreted per element).
    */
  def tokens(text: Column): Column = {
    val t = trim(lower(text))
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** All n-word grams of a token array WITH duplicates preserved — the
    * input to repetition statistics and duplicate-span detection, where
    * occurrence counts are the whole point (contrast [[shingles3]], which
    * deduplicates for set-Jaccard). Built by folding zip-with-shifted-self
    * n-1 times: each step extends every gram by the next word, `words`
    * only ever appears as a top-level array argument (evaluated once per
    * row — the shingles3 codegen rationale), and a shorter-than-n tail
    * pairs with null, whose concat propagates null into the gram that the
    * final filter drops. <n tokens therefore yields [] with no
    * special-casing.
    */
  def gramsN(words: Column, n: Int): Column = {
    require(n >= 2, "a 1-gram is the token array itself")
    val g = (2 to n).foldLeft(words) { (acc, k) =>
      zip_with(acc, slice(words, lit(k), size(words)),
        (a, b) => concat(a, lit(" "), b))
    }
    filter(g, x => x.isNotNull)
  }

  /** All 2-word grams with duplicates preserved — see [[gramsN]]. */
  def grams2(words: Column): Column = gramsN(words, 2)

  /** All 3-word grams with duplicates preserved — see [[gramsN]]. */
  def grams3(words: Column): Column = gramsN(words, 3)

  /** Distinct 3-word shingles of a token array, built by zipping the array
    * with its own 1- and 2-shifted slices. Deliberately NOT the
    * transform(sequence(...), i => element_at(words, i+k)) formulation:
    * after CollapseProject inlines `words`' defining expression, element_at
    * inside the lambda re-evaluates that whole pipeline PER ELEMENT in the
    * interpreted path (measured 25s at sf0.1 vs ~1s for this shape). Here
    * `words` appears only as a top-level array argument — evaluated once
    * per row. Trailing zip positions pair with null, making null shingles
    * that the final filter drops; <3 tokens therefore yields [] with no
    * special-casing.
    */
  def shingles3(words: Column): Column = {
    val w12 = zip_with(words, slice(words, lit(2), size(words)),
      (a, b) => concat(a, lit(" "), b))
    val w123 = zip_with(w12, slice(words, lit(3), size(words)),
      (ab, c) => concat(ab, lit(" "), c))
    array_distinct(filter(w123, x => x.isNotNull))
  }

  /** HTML → text extraction — step one of every crawl-curation pipeline:
    * drop script/style blocks and comments WITH their contents, strip the
    * remaining tags, decode the five core entities, collapse whitespace.
    * A chain of codegen'd regexp/replace passes — no UDF, and every
    * pattern is RE2-compatible so a DuckDB oracle replays it
    * bit-for-bit. Entity order matters: `&amp;` decodes LAST, so the
    * literal text "&amp;lt;" correctly yields "&lt;" and never
    * double-decodes to "<". This is tag-level extraction, not a DOM
    * parse — malformed nesting degrades to extra whitespace, never to an
    * error (the dirty-feed contract).
    */
  def stripHtml(html: Column): Column = {
    // (?i): HTML tag names are case-insensitive — <SCRIPT> blocks would
    // otherwise leak their contents into the "clean" text
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val ent = org.apache.spark.sql.functions.replace(
      org.apache.spark.sql.functions.replace(
        org.apache.spark.sql.functions.replace(
          org.apache.spark.sql.functions.replace(
            org.apache.spark.sql.functions.replace(
              noTags, lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(ent, "\\s+", " "))
  }

}
