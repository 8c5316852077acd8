package graft.ops

import graft.{QueryPack, Tables}
import graft.api.GraftOps
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second curation pack (SURVEY.md §2.9 extensions): paragraph-level
  * boilerplate removal, token-budget domain mixing, BM25 retrieval, and
  * the CDC/changelog merge. Split from LlmQueries only for file size —
  * same tier, same gate discipline (md5-seeded determinism, exact integer
  * math wherever a float could diverge between engines).
  */
object CurateQueries extends QueryPack {

  /** Every doc carries this synthetic template footer (plus a per-source
    * one), so paragraph-dedup has guaranteed cross-document boilerplate at
    * every SF — the same planted-fixture move as x_pii_scrub. Natural
    * 16-token window repeats across near-duplicate docs join them.
    */
  private val GlobalFooter = "subscribe for updates all rights reserved"
  private val ParaTokens = 16
  private val MinDocs = 3

  /** x_dedup_para: drop paragraphs appearing in >= 3 distinct docs.
    * Fixture paragraphs are 16-token windows of the single-line text plus
    * the planted global/per-source footers; production input is a real
    * split-on-blank-lines column. kept_md5 proves span-exact agreement.
    */
  def dedupPara(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) > 0)
    val paras = concat(
      transform(
        sequence(lit(0), floor((size(col("w")) - 1) / lit(ParaTokens)).cast("int")),
        i => array_join(slice(col("w"), i * ParaTokens + 1, lit(ParaTokens)), " ")),
      array(lit(GlobalFooter),
        concat(lit("from "), col("source"), lit(" all rights reserved"))))
    GraftOps.dedupParagraphs(base, col("doc_id"), paras, minDocs = MinDocs)
  }

  /** x_mix_domain: token-budget mixing over the `source` column — even
    * sources get a 1000-token budget, odd 500, realized as an exact
    * integer ppm sampling rate per domain.
    */
  def mixDomain(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(TextFns.tokens(col("text"))).as("nt"))
    GraftOps.mixDomains(docs, col("doc_id"), col("source"), col("nt"),
      when(substring(col("source"), 4, 10).cast("int") % 2 === 0, lit(1000L))
        .otherwise(lit(500L)))
  }

  /** x_bm25: Okapi BM25 top-10 for a fixed 3-term query over the corpus
    * vocabulary. Rank on the rounded score on both engines.
    */
  def bm25(s: SparkSession, d: String): DataFrame =
    GraftOps.bm25Rank(Tables.documents(s, d), col("doc_id"), col("text"),
      terms = Seq("spark", "table", "merge"), k = 10)

  /** q_cdc_merge: replay the events changelog to final per-user state —
    * last write by (ts, event_id) wins; a user whose last event is an
    * 'error' (the delete op here) drops out of the merged state.
    */
  def cdcMerge(s: SparkSession, d: String): DataFrame =
    GraftOps.cdcMerge(Tables.events(s, d), col("user_id"), col("ts"),
        col("event_id"), col("event_type"), col("value"), deleteOp = "error")
      .select(col("key").as("user_id"), col("n_changes"),
        col("last_version").as("last_ts"), col("last_op").as("last_type"),
        round(col("last_value"), 6).as("last_value"))

  /** x_dedup_incr: incremental dedup — the delta batch (doc_id % 5 == 0
    * stands in for "today's crawl") flagged against the existing corpus
    * (the other 80%), exactly and nearly. Candidates are delta-bands ×
    * existing-bands only — the existing corpus is never self-joined.
    */
  def dedupIncr(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    GraftOps.dedupIncremental(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0),
      col("doc_id"), col("text"))
  }

  /** x_perplexity: corpus-trained add-one unigram LM, per-doc mean NLL and
    * perplexity — the CCNet-style quality-filter signal.
    */
  def perplexity(s: SparkSession, d: String): DataFrame =
    GraftOps.perplexity(Tables.documents(s, d), col("doc_id"), col("text"))

  /** x_perplexity_bi: corpus-trained Laplace BIGRAM LM, per-doc mean
    * pairwise NLL and perplexity — the higher-fidelity companion to the
    * unigram x_perplexity.
    */
  def perplexityBi(s: SparkSession, d: String): DataFrame =
    GraftOps.perplexityBigram(Tables.documents(s, d), col("doc_id"),
      col("text"))

  /** x_perplexity_interp: Jelinek–Mercer λ=0.75 interpolated bigram LM —
    * smooth unigram backoff instead of Laplace's uniform flattening.
    */
  def perplexityInterp(s: SparkSession, d: String): DataFrame =
    GraftOps.perplexityInterp(Tables.documents(s, d), col("doc_id"),
      col("text"))

  /** x_nb_langid: multinomial Naive Bayes trained on the corpus's own
    * language labels and applied corpus-wide ([[GraftOps.naiveBayes]]) —
    * the supervised mislabel-detection baseline next to the
    * [[quality_lr]] linear probe. Training is one count shuffle (the
    * counts ARE the model); apply is one term equi-join + a bounded
    * class cross.
    */
  def nbLangId(s: SparkSession, d: String): DataFrame =
    GraftOps.naiveBayes(Tables.documents(s, d), col("doc_id"), col("text"),
      col("lang"))

  /** x_eval_metrics: per-class precision/recall for the [[nbLangId]]
    * predictions ([[GraftOps.evalMetrics]]) — the evaluation rollup that
    * closes the train→apply→measure loop; one bounded confusion shuffle,
    * exact integer ppm metrics.
    */
  def evalMetricsQ(s: SparkSession, d: String): DataFrame =
    GraftOps.evalMetrics(nbLangId(s, d), col("actual"), col("predicted"))

  /** x_lang_seg: per-paragraph language segmentation
    * ([[GraftOps.langSegment]]) — the mixed-page screen composing the
    * [[nbLangId]] model with the boilerplate line grain: per paragraph
    * an NB language call, per document the dominant-language share and
    * the mixed flag. The fixture PLANTS mixed pages: every doc's page
    * is 1–2 eight-word slices of its own text, and every third doc
    * appends a paragraph of the NEXT language's top-8 tokens (count
    * desc, term asc — a total order), so cross-language paragraphs
    * exist at every SF by construction. The oracle replays the
    * phrasebook, the page synthesis, the NB model and the per-paragraph
    * argmax from the same derivation, so the whole chain is
    * load-bearing in the hash gate. The lang×lang next-language pick
    * is a bounded (|langs|²) broadcast nested loop — the documented
    * bounded-broadcast shape, never corpus-sized.
    */
  def langSegQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("lang"),
        explode(TextFns.tokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("c"))
    val w8 = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("term").asc)
    val phrase = toks.withColumn("rn", row_number().over(w8))
      .filter(col("rn") <= 8)
      .groupBy(col("lang"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("rn"), col("term")))),
        x => x.getField("term"))).as("phrase"))
    val langs = docs.select(col("lang")).distinct()
    val minLang = langs.agg(min(col("lang")).as("lmin"))
    val nxt = langs
      .join(broadcast(langs.select(col("lang").as("b_lang"))),
        col("b_lang") > col("lang"), "left")
      .groupBy(col("lang")).agg(min(col("b_lang")).as("nl"))
      .crossJoin(broadcast(minLang))
      .select(col("lang"), coalesce(col("nl"), col("lmin")).as("next_lang"))
    val foreign = nxt
      .join(phrase.withColumnRenamed("lang", "next_lang"), "next_lang")
      .select(col("lang"), col("phrase").as("fphrase"))
    val para = (j: org.apache.spark.sql.Column) =>
      concat_ws(" ", slice(col("w"), lit(1) + (j - lit(1)) * lit(8), lit(8)))
    val withPage = docs.join(broadcast(foreign), "lang")
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("page", concat(
        array_join(transform(
          sequence(lit(1), lit(1) + (col("doc_id") % 2).cast("int")), para),
          "\n"),
        when(col("doc_id") % 3 === 0, concat(lit("\n"), col("fphrase")))
          .otherwise(lit(""))))
    GraftOps.langSegment(withPage, col("doc_id"), col("page"),
      col("text"), col("lang"))
  }

  /** x_dataset_split: the 98/1/1 train/val/test freeze —
    * disjoint-exhaustive md5-bucket assignment with per-split doc/token
    * totals and an order-insensitive membership digest; 3 gated rows
    * certify the full corpus partition ([[GraftOps.datasetSplit]]).
    */
  def datasetSplit(s: SparkSession, d: String): DataFrame =
    GraftOps.datasetSplit(Tables.documents(s, d), col("doc_id"), col("text"))

  /** x_split_nodup: the leakage-safe split audit ([[GraftOps
    * .splitLeakage]]) — doc-keyed vs near-dup-class-keyed 50/25/25
    * assignment over the MinHash signature classes; gates that the naive
    * split DOES straddle duplicate classes (the eval-contamination bug,
    * counted exactly) while the class-keyed split straddles zero.
    */
  def splitNodup(s: SparkSession, d: String): DataFrame =
    GraftOps.splitLeakage(Tables.documents(s, d), col("doc_id"), col("text"))

  /** x_kl_drift: per-source unigram KL divergence vs the whole corpus
    * ([[GraftOps.klDrift]]) — the distribution-shift monitor run when a
    * new snapshot/source lands in the mix.
    */
  def klDriftQ(s: SparkSession, d: String): DataFrame =
    GraftOps.klDrift(Tables.documents(s, d), col("source"), col("text"))

  /** x_zipf: per-source Zipf-law fit ([[GraftOps.zipfFit]]) — slope and
    * R² of ln(freq) vs ln(rank) over each source's top-30 terms; the
    * template/degenerate-slice diagnostic next to [[klDriftQ]].
    */
  def zipfQ(s: SparkSession, d: String): DataFrame =
    GraftOps.zipfFit(Tables.documents(s, d), col("source"), col("text"))

  /** x_heaps: per-source Heaps-law vocabulary-growth fit ([[GraftOps
    * .heapsFit]]) — β of ln(distinct) vs ln(tokens) across each
    * source's documents; [[zipfQ]]'s companion diagnostic.
    */
  def heapsQ(s: SparkSession, d: String): DataFrame =
    GraftOps.heapsFit(Tables.documents(s, d), col("source"), col("text"))

  /** x_html_strip: HTML → text extraction ([[TextFns.stripHtml]]) — the
    * crawl pipeline's first transform. The fixture wraps each document
    * in a deterministic page (head/title, a script block with markup-
    * hostile content, a style block, entities, a comment), so the gate
    * proves block removal, tag stripping, correctly-ordered entity
    * decode and whitespace collapse against a DuckDB replay of the same
    * construction and the same RE2-compatible passes. Pure map work,
    * zero shuffles.
    */
  def htmlStrip(s: SparkSession, d: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>Doc "), col("doc_id"),
      lit("</title><script type=\"text/javascript\">var a = 1 && b < 2; " +
        "// <p>not text</p></script><style>.x { color: red; }</style>" +
        "</head><body><h1>Doc "), col("doc_id"),
      lit("</h1><p>"), col("text"),
      lit("</p><p>Tom &amp; Jerry say &quot;hi&quot; &lt;3 &gt; &#39;ok&#39; " +
        "literal &amp;lt;</p><!-- hidden <b>comment</b> --></body></html>"))
    Tables.documents(s, d)
      .select(col("doc_id"), html.as("html"))
      .select(col("doc_id"),
        length(col("html")).cast("long").as("n_chars_raw"),
        TextFns.stripHtml(col("html")).as("clean"))
      .select(col("doc_id"), col("n_chars_raw"),
        length(col("clean")).cast("long").as("n_chars_clean"),
        md5(col("clean")).as("clean_md5"))
  }

  /** x_perplexity_kn: interpolated Kneser–Ney bigram perplexity — the
    * strongest classical n-gram smoothing, completing the LM-quality
    * tier (add-one unigram → add-one bigram → Jelinek–Mercer → KN).
    */
  def perplexityKn(s: SparkSession, d: String): DataFrame =
    GraftOps.perplexityKneserNey(Tables.documents(s, d), col("doc_id"),
      col("text"))

  /** x_ccnet: CCNet-style per-language perplexity split — head (≤ p25),
    * middle (≤ p75), tail; the curation gate that routes each language's
    * cleanest slice to training.
    */
  def ccnet(s: SparkSession, d: String): DataFrame =
    GraftOps.ccnetBuckets(Tables.documents(s, d), col("doc_id"),
      col("text"), col("lang"))

  /** x_outlier_embed: semantic outlier flags — each embedding's cosine
    * to its label group's spherical centroid; vectors pointing away
    * (rounded cosine < 0) flagged for curation review.
    */
  def outlierEmbed(s: SparkSession, d: String): DataFrame =
    GraftOps.embedOutliers(Tables.embeddings(s, d), col("vec_id"),
      col("embedding"), col("label"), threshold = 0.0)

  /** x_dedup_embed_cluster: semantic duplicate clusters — connected
    * components over the embedding-cosine near-dup pairs; the semantic
    * analog of x_dedup_cluster, composed from the same two operators.
    */
  def dedupEmbedCluster(s: SparkSession, d: String): DataFrame =
    // planesOf, not a fresh planesFor(count()): the memoized derivation
    // (LlmQueries) keeps this composition from paying an extra count job
    // per plan build and from drifting if the bucket budget changes
    GraftOps.clusterPairs(
      GraftOps.dedupEmbed(Tables.embeddings(s, d), col("vec_id"),
          col("embedding"), planes = LlmQueries.planesOf(s, d), dim = 64,
          threshold = 0.4)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))

  /** x_frame_sample: multimodal frame sampling — frame count derived from
    * the payload (md5 window, 16..79 frames at a nominal 25 fps), every
    * 8th frame sampled, at most 8 samples per doc. The decode is the
    * documented deterministic stub; the metadata→index→explode plumbing
    * is the real part.
    */
  def frameSample(s: SparkSession, d: String): DataFrame =
    GraftOps.sampleFrames(
      Tables.documents(s, d),
      col("doc_id"),
      sha2(col("text").cast("binary"), 256),
      conv(substring(md5(col("text")), 9, 4), 16, 10).cast("long") % 64 + 16,
      stride = 8, maxFrames = 8)

  /** x_dedup_substr: substring-level exact dedup — 16-token sliding
    * windows hashed, spans occurring >= 2 times corpus-wide flagged,
    * per-doc duplicated-window fraction + a 20% flag. The span-level
    * memorization signal document-level dedup misses.
    */
  def dedupSubstr(s: SparkSession, d: String): DataFrame =
    GraftOps.dedupSubstrings(Tables.documents(s, d), col("doc_id"),
      col("text"), window = 16)

  /** x_dedup_suffix: suffix-array substring dedup — the exact
    * maximal-span Lee-et-al upgrade over [[dedupSubstr]]'s fixed
    * windows: distributed prefix-doubling suffix array + adjacent-class
    * LCP descent, reporting each document's longest duplicated span
    * (any length, not window-quantized), its >= 10-token duplicated
    * positions, and the exact token fraction covered by such spans.
    * Oracle is a brute-force replay: for every position the longest
    * m-gram (m <= 64) occurring >= 2 times corpus-wide, then the same
    * interval-union coverage — identical semantics, exhaustive search.
    */
  def dedupSuffixQ(s: SparkSession, d: String): DataFrame =
    GraftOps.dedupSuffix(Tables.documents(s, d), col("doc_id"),
      col("text"), minSpan = SufMinSpan, cap = SufCap)

  /** x_dedup_onion: the suffix dedup's APPLY step ([[GraftOps
    * .dedupOnion]]) — remove every token inside a >= 10-token duplicated
    * span and emit retained counts + the retained text's md5; the
    * cleaned corpus a Lee-et-al substring pass actually ships.
    */
  def dedupOnionQ(s: SparkSession, d: String): DataFrame =
    GraftOps.dedupOnion(Tables.documents(s, d), col("doc_id"),
      col("text"), minSpan = SufMinSpan, cap = SufCap)

  /** x_dedup_suffix_deep: the SAME suffix-array operator through its
    * OTHER strategy branch — cap=256 sits above DirectSortCap=128, so
    * this query exercises the prefix-doubling loop (doc-keyed lead()
    * rounds, driver-offset dense ranks, doubling-side representative
    * slices) that the cap=64 registration never touches, against the
    * same brute-force positions×lengths oracle at m ≤ 256. The gate
    * seeds at 64 tokens — two doubling rounds instead of five — which
    * exercises every doubling-branch code path while costing a
    * standing-gate-appropriate wall (r14 measured 5.6s → 3.2s warm at
    * sf0.01; seed=128 was re-measured in r15 and is WORSE, 7.2 → 8.4s
    * at sf0.1 — the doubled seed-gram bytes cost more than the round
    * they save; output is seed-invariant, so the oracle is untouched;
    * the production default stays seed=8, the wire-optimal setting,
    * and keeps its own brute-force law in CurateOpsSpec). The fixture's
    * longest doc is under the cap, so reported spans are EXACT (not
    * cap-quantized) and the oracle's exhaustive search is still only
    * n(n+1)/2 grams per doc. A doubling-branch regression ships red,
    * not green.
    */
  def dedupSuffixDeepQ(s: SparkSession, d: String): DataFrame =
    GraftOps.dedupSuffix(Tables.documents(s, d), col("doc_id"),
      col("text"), minSpan = SufMinSpan, cap = SufCapDeep,
      seed = SufSeedDeep)

  /** The synthesized raw-URL column for x_dedup_url, as a SQL
    * expression over doc_id — covers every canonicalization rule:
    * scheme/host case variants (mod 3/5), an explicit default :443
    * port (mod 11), trailing slashes (mod 2), utm tracking params and
    * unsorted param order (mod 3/7), fragments (mod 4). The DuckDB
    * oracle repeats this formula verbatim modulo the STRING/VARCHAR
    * cast keyword — keep the two in sync.
    */
  private def urlFixture(castKw: String) =
    s"""(CASE WHEN doc_id % 5 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
       |(CASE WHEN doc_id % 3 = 0
       |      THEN 'WWW.EXAMPLE' || CAST(doc_id % 40 AS $castKw) || '.COM'
       |      WHEN doc_id % 3 = 1
       |      THEN 'www.example' || CAST(doc_id % 40 AS $castKw) || '.com'
       |      ELSE 'Www.Example' || CAST(doc_id % 40 AS $castKw) || '.Com'
       | END) ||
       |(CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END) ||
       |'/Docs/Page-' || CAST(doc_id % 25 AS $castKw) ||
       |(CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
       |(CASE WHEN doc_id % 3 = 0
       |      THEN '?utm_source=feed&id=' || CAST(doc_id % 10 AS $castKw)
       |      WHEN doc_id % 7 = 0 THEN '?b=2&a=1'
       |      WHEN doc_id % 13 = 0 THEN '?a=1&ref&fbclid' ELSE '' END) ||
       |(CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END)""".stripMargin
      .replace("\n", " ")

  /** Shared canonicalization CTE chain (fixture URL synthesis → c2
    * with per-doc canon_url) feeding BOTH the x_dedup_url and
    * x_url_filter oracles — one copy of every canonicalization rule,
    * the sufCommon discipline.
    */
  private lazy val urlCanonCtes =
    raw"""WITH u AS (
      |  SELECT doc_id, """.stripMargin + urlFixture("VARCHAR") +
      raw""" AS url FROM documents),
      |c AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |      AS scheme,
      |    lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)) AS auth0,
      |    regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path0,
      |    regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS q
      |  FROM u),
      |cp AS (
      |  SELECT *, coalesce(array_to_string(list_sort(list_filter(
      |      string_split(q, '&'),
      |      p -> NOT (starts_with(p, 'utm_')
      |        OR p = 'ref' OR starts_with(p, 'ref=')
      |        OR p = 'fbclid' OR starts_with(p, 'fbclid=')
      |        OR p = 'gclid' OR starts_with(p, 'gclid=')
      |        OR p = ''))), '&'), '') AS pstr,
      |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS pabs
      |  FROM c),
      |c2 AS (
      |  SELECT doc_id, url,
      |    scheme || '://' ||
      |    (CASE WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$$', '')
      |          WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$$', '')
      |          ELSE auth0 END) ||
      |    (CASE WHEN pabs <> '/' THEN regexp_replace(pabs, '/$$', '')
      |          ELSE pabs END) ||
      |    (CASE WHEN pstr = '' THEN '' ELSE '?' || pstr END) AS canon_url
      |  FROM cp)""".stripMargin

  /** Blocklist rules for x_url_filter, shared verbatim with its oracle
    * (rendered as SQL VALUES): every 5th fixture host disallows the
    * /Docs/Page-1 path PREFIX — which also catches Page-10..Page-19,
    * the realistic prefix-rule semantics a robots disallow carries.
    */
  private val UrlRules: Seq[(String, String)] =
    (0 to 7).map(k => (s"www.example${k * 5}.com", "/Docs/Page-1"))

  /** x_url_filter: URL blocklist filtering ([[GraftOps.filterUrls]]) —
    * the robots/policy screen next to x_dedup_url: broadcast
    * (host, path-prefix) disallow rules matched against CANONICAL
    * host/path (case/port/tracking variants cannot slip past), per-URL
    * any-match, per-host kept/dropped rollup. The oracle replays the
    * same rule table through the same canonicalization chain.
    */
  def urlFilterQ(s: SparkSession, d: String): DataFrame =
    GraftOps.filterUrls(
      Tables.documents(s, d).withColumn("url", expr(urlFixture("STRING"))),
      col("doc_id"), col("url"), UrlRules)

  /** x_robots: robots.txt group parse ([[GraftOps.parseRobots]]) — the
    * crawl-POLICY text format completing the front door (WARC walk →
    * robots policy → URL canonicalization/blocklist): per host, the
    * Allow/Disallow rules applying to agent "graftbot" under the RFC
    * 9309 group model. The fixture plants every parse hazard — casing
    * variants ("User-Agent"), inline `#` comments, an empty
    * "Disallow:" (nothing disallowed — no row), multi-UA group headers
    * (every 15th host), a blank line inside the file, and an exact
    * "GraftBot" group on every 3rd host that must SHADOW the `*` group
    * (case-insensitive match). The oracle predicts the surviving rule
    * rows arithmetically from the planted structure, so every rule of
    * the parser is load-bearing in the hash gate.
    */
  def robotsQ(s: SparkSession, d: String): DataFrame = {
    val k = (col("doc_id") % 10).cast("string")
    val content = concat(
      lit("# graft crawl policy\n"),
      lit("User-Agent: *\n"),
      lit("Disallow: /private\n"),
      lit("Allow: /private/ok # inline comment\n"),
      when(col("doc_id") % 7 === 0, lit("Disallow:\n")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0, concat(
        lit("\nUser-agent: GraftBot\n"),
        when(col("doc_id") % 5 === 0, lit("User-agent: otherbot\n"))
          .otherwise(lit("")),
        lit("Disallow: /trap-"), k, lit("\n"),
        when(col("doc_id") % 2 === 0,
          concat(lit("Allow: /trap-"), k, lit("/ok\n")))
          .otherwise(lit("")))).otherwise(lit("")))
    GraftOps.parseRobots(
      Tables.documents(s, d).select(col("doc_id"), content.as("robots")),
      concat(lit("h"), col("doc_id").cast("string")), col("robots"),
      agent = "graftbot")
  }

  /** x_boilerplate: line-density boilerplate removal
    * ([[GraftOps.boilerplateScreen]]) — the extraction-quality stage
    * after HTML strip: nav menus and link footers (high anchor-text
    * density, short lines) drop; real paragraphs (≥ 8 words, anchor
    * share ≤ 35% exact ppm) survive, in order, with an md5 of the
    * retained clean text. The fixture builds an html-ish page per doc
    * — a 3-link nav bar, 1–3 content paragraphs sliced from the doc's
    * own words (the first carrying a low-density inline link), a
    * too-short "Thanks!" line and a link-heavy footer — and the oracle
    * replays BOTH the page synthesis and the full per-line screen in
    * DuckDB, so every rule (tag strip, anchor-chars extraction, word
    * floor, ppm density, ordered reassembly) is load-bearing in the
    * hash gate.
    */
  def boilerplateQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("w", filter(split(col("text"), "\\s+"), x => x =!= ""))
    val para = (j: org.apache.spark.sql.Column) => concat(
      concat_ws(" ",
        slice(col("w"), lit(1) + (j - lit(1)) * lit(8), lit(8))),
      when(j === 1, lit(" <a href=\"/t\">details</a>")).otherwise(lit("")))
    val html = concat(
      lit("<a href=\"/\">Home</a> | <a href=\"/about\">About us</a>" +
        " | <a href=\"/c\">Contact</a>\n"),
      array_join(transform(
        sequence(lit(1), lit(1) + (col("doc_id") % 3).cast("int")), para),
        "\n"),
      lit("\nThanks!\n"),
      lit("(c) 2024 <a href=\"/privacy\">Privacy</a>"))
    GraftOps.boilerplateScreen(docs.select(col("doc_id"),
      html.as("page")), col("doc_id"), col("page"))
  }

  /** x_dedup_url: canonical-URL dedup ([[GraftOps.dedupUrl]]) — the
    * crawl frontier's zeroth dedup stage: case-folded scheme/authority,
    * default-port and fragment strip, tracking-param drop, query-param
    * sort, trailing-slash strip, then one canonical-key rollup with the
    * fetches-saved readout (n_raw_forms per canonical key). The oracle
    * replays BOTH the fixture URL synthesis and the full
    * canonicalization pipeline in DuckDB, so the hash gate covers every
    * rule, not a planted-class shortcut.
    */
  def dedupUrlQ(s: SparkSession, d: String): DataFrame =
    GraftOps.dedupUrl(
      Tables.documents(s, d).withColumn("url", expr(urlFixture("STRING"))),
      col("doc_id"), col("url"))

  /** x_anchor_text: anchor-text index ([[GraftOps.anchorIndex]]) — the
    * link-graph signal extraction next to x_html_strip: per canonical
    * link target, in-link count, distinct linking docs, anchor-token
    * volume, and the modal anchor term. The fixture plants 1–3 anchors
    * per doc whose href spelling rotates through three forms the
    * canonicalizer must collapse (already-canonical; SHOUTED scheme +
    * :443 + a utm param; unsorted query + fragment), one relative href
    * on every 4th doc (the visible NULL-canonical group), and an
    * href-less `<a>` tag the extractor must skip. The oracle replays
    * the anchor list arithmetically — so the Spark side's regexp
    * extraction AND canonicalization chain are both load-bearing in
    * the hash gate.
    */
  def anchorTextQ(s: SparkSession, d: String): DataFrame = {
    val t = (j: org.apache.spark.sql.Column) => ((col("doc_id") * 7 + j * 11) % 40).cast("string")
    val p = (j: org.apache.spark.sql.Column) => ((col("doc_id") + j) % 6).cast("string")
    val anchor = (j: org.apache.spark.sql.Column) => {
      val v = (col("doc_id") + j) % 3
      val base = concat(lit("https://example"), t(j), lit(".com/q"), p(j))
      val href = when(v === 0, base)
        .when(v === 1, concat(lit("HTTPS://EXAMPLE"), t(j),
          lit(".COM:443/q"), p(j), lit("?utm_source=x")))
        .otherwise(concat(base, lit("?b=2&a=1#frag")))
      concat(lit("<a href=\""), href, lit("\">link "), t(j),
        lit(" page"), p(j), lit("</a>"))
    }
    val page = concat(
      lit("<html><body><p>intro</p>"),
      array_join(transform(
        sequence(lit(1), lit(1) + (col("doc_id") % 3).cast("int")), anchor),
        " and "),
      when(col("doc_id") % 4 === 0,
        lit("<a href=\"/local\">here</a>")).otherwise(lit("")),
      lit("<a class=\"x\">no href</a></body></html>"))
    GraftOps.anchorIndex(Tables.documents(s, d).select(col("doc_id"),
      page.as("page")), col("doc_id"), col("page"))
  }

  /** x_sitemap: sitemap.xml URL extraction ([[GraftOps.parseSitemap]])
    * — the frontier-discovery stage completing the policy pair (robots
    * names the sitemaps, the sitemap names the URLs): per `<url>`
    * block the canonicalized `<loc>` plus verbatim optional
    * `<lastmod>`/`<priority>`. The fixture plants 1–3 entries per host
    * — every 2nd entry's loc carries a utm param the canonicalizer
    * must strip (a sitemap spelling variant of a known URL must not
    * look new to the frontier), lastmod on every 3rd, priority on
    * every 5th — and every 11th host appends a spec-invalid loc-less
    * block that must stay VISIBLE as the ''-loc row. The oracle
    * replays the synthesis arithmetically.
    */
  def sitemapQ(s: SparkSession, d: String): DataFrame = {
    val entry = (j: org.apache.spark.sql.Column) => {
      val t = ((col("doc_id") * 3 + j * 7) % 50).cast("string")
      concat(
        lit("<url><loc>https://s"), col("doc_id").cast("string"),
        lit(".example.com/page-"), t,
        when((col("doc_id") + j) % 2 === 0,
          lit("?utm_campaign=x")).otherwise(lit("")),
        lit("</loc>"),
        when((col("doc_id") + j) % 3 === 0,
          concat(lit("<lastmod>2024-0"), j.cast("string"),
            lit("-01</lastmod>"))).otherwise(lit("")),
        when((col("doc_id") + j) % 5 === 0,
          lit("<priority>0.8</priority>")).otherwise(lit("")),
        lit("</url>"))
    }
    val xml = concat(
      lit("<?xml version=\"1.0\"?><urlset>"),
      array_join(transform(
        sequence(lit(1), lit(1) + (col("doc_id") % 3).cast("int")),
        entry), ""),
      when(col("doc_id") % 11 === 0,
        lit("<url><lastmod>2024-01-01</lastmod></url>"))
        .otherwise(lit("")),
      lit("</urlset>"))
    GraftOps.parseSitemap(
      Tables.documents(s, d).select(col("doc_id"), xml.as("x")),
      concat(lit("s"), col("doc_id").cast("string")), col("x"))
  }

  /** x_redirect_resolve: redirect-chain resolution
    * ([[GraftOps.resolveRedirects]]) — the crawl-frontier stage whose
    * absence makes URL dedup lie: 3xx chains resolve to their FINAL
    * URL by pointer doubling (O(log maxHops) self-join shuffles, zero
    * driver iteration). The fixture builds the redirect functional
    * graph over synthetic URLs: chains of ≤ 5 inside each doc-id block
    * of 5 (i → i+1, block tail terminal), the corpus max id pinned
    * terminal so no pointer dangles, and every 101st id (i % 101 = 7)
    * pointing BACKWARD — which forms a genuine 2-cycle with its
    * neighbor whenever neither is a block tail, so unresolved rows
    * (resolved=0, '' final, 0 hops) exist at every SF by construction
    * and the cycle arm of the resolver is load-bearing. The oracle
    * replays the walk with a hop-capped recursive CTE.
    */
  def redirectResolveQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id").as("i"))
    val maxI = docs.agg(max(col("i")).as("max_i"))
    val u = (x: org.apache.spark.sql.Column) => concat(lit("https://r"), x.cast("string"),
      lit(".example.com/"))
    val edges = docs.crossJoin(broadcast(maxI)).select(
      u(col("i")).as("u"),
      when(col("i") % 5 === 4 || col("i") === col("max_i"),
        lit(null).cast("string"))
        .when(col("i") % 101 === 7, u(col("i") - 1))
        .otherwise(u(col("i") + 1)).as("nxt"))
    GraftOps.resolveRedirects(edges, col("u"), col("nxt"), maxHops = 32)
  }

  /** Suffix-dedup knobs, shared between [[dedupSuffixQ]] and its oracle
    * SQL so a tuning change cannot desync the gate (the Uni* pattern).
    * SufCapDeep must stay > the engine's DirectSortCap (128) — its
    * whole point is forcing the prefix-doubling branch.
    */
  private val SufMinSpan = 10
  private val SufCap = 64
  private val SufCapDeep = 256
  private val SufSeedDeep = 64

  /** Shared brute-force suffix-dedup CTE prefix (per-position longest
    * duplicated m-gram + interval-union running end) — ONE copy feeding
    * the x_dedup_suffix, x_dedup_suffix_deep and x_dedup_onion oracles
    * (parameterized only by the gram cap), so a knob or semantics
    * change cannot desync one of the gates (the minhashCommon
    * discipline).
    */
  private def sufCommonFor(cap: Int) =
    s"""WITH ws AS (
       |  SELECT doc_id,
       |    [w for w in string_split_regex(trim(lower(text)), '\\s+') if w != ''] w
       |  FROM documents),
       |d AS (SELECT doc_id, w, len(w) n FROM ws WHERE len(w) >= 1),
       |g AS (
       |  SELECT doc_id, i AS p, m,
       |    md5(array_to_string(list_slice(w, i, i + m - 1), ' ')) h
       |  FROM d, unnest(generate_series(1, n)) t(i),
       |       unnest(generate_series(1, $cap)) u(m)
       |  WHERE i + m - 1 <= n),
       |dup AS (SELECT m, h FROM g GROUP BY m, h HAVING count(*) >= 2),
       |dl0 AS (SELECT g.doc_id, g.p, max(g.m) dl
       |  FROM g JOIN dup USING (m, h) GROUP BY 1, 2),
       |posn AS (SELECT doc_id, n, unnest(generate_series(1, n)) p FROM d),
       |pp AS (
       |  SELECT posn.doc_id, posn.n, posn.p, coalesce(dl0.dl, 0) dl
       |  FROM posn LEFT JOIN dl0
       |    ON dl0.doc_id = posn.doc_id AND dl0.p = posn.p),
       |mk AS (
       |  SELECT doc_id, n, p, dl,
       |    max(CASE WHEN dl >= $SufMinSpan THEN p + dl END) OVER
       |      (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) rm
       |  FROM pp)""".stripMargin

  /** The per-doc span-stats select shared by the x_dedup_suffix and
    * x_dedup_suffix_deep oracles — cap-independent by construction
    * (the cap lives only in the g CTE), so both strategy branches are
    * replayed under one copy of the semantics.
    */
  private lazy val sufSelect =
    s"""
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  CAST(max(dl) AS BIGINT) AS max_dup_span,
       |  CAST(coalesce(sum(CASE WHEN dl >= $SufMinSpan THEN 1 END), 0) AS BIGINT)
       |    AS n_dup_positions,
       |  CAST(coalesce(sum(CASE WHEN rm > p THEN 1 END), 0) AS BIGINT)
       |    AS covered_tokens,
       |  round(coalesce(sum(CASE WHEN rm > p THEN 1 END), 0)
       |    / CAST(n AS DOUBLE), 6) AS dup_coverage
       |FROM mk GROUP BY doc_id, n""".stripMargin

  /** Unigram-LM tokenizer constants, shared between the gated queries
    * and the unrolled oracle generator so a knob change cannot desync
    * the gate. maxWordLen bounds the oracle's DP unroll (one CTE per
    * character position); the fixture vocabulary tops out at 8.
    */
  private val UniRounds = 2
  private val UniMaxPiece = 4
  private val UniSeedMultis = 24
  private val UniTarget = 48
  private val UniMaxWordLen = 10

  /** x_unigram_train: unigram-LM (SentencePiece-style) tokenizer
    * training — the missing half of the tokenizer tier next to
    * [[bpeTrainQ]]: substring-seeded vocabulary, two hard-EM (Viterbi)
    * rounds over the distinct-word table, pruned to the target size.
    * All Viterbi arithmetic is integer micro-logs, so the unrolled
    * DuckDB oracle replays every segmentation decision exactly.
    */
  def unigramTrainQ(s: SparkSession, d: String): DataFrame =
    GraftOps.unigramTrain(Tables.documents(s, d), col("text"),
      rounds = UniRounds, maxPieceLen = UniMaxPiece,
      seedMultis = UniSeedMultis, targetSize = UniTarget,
      maxWordLen = UniMaxWordLen)

  /** x_unigram_apply: the tokenizer serve path — Viterbi segmentation
    * of every document under the LEARNED piece table (one DP per
    * distinct word, vocabulary-bounded), gated on per-doc piece counts
    * plus an md5 over the full positional segmentation.
    */
  def unigramApplyQ(s: SparkSession, d: String): DataFrame = {
    val pieces = unigramTrainQ(s, d).select(col("piece"), col("wt_micro"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    GraftOps.unigramApply(Tables.documents(s, d), col("doc_id"),
      col("text"), pieces, maxPieceLen = UniMaxPiece)
  }

  /** x_bpe_stats: tokenizer-prep corpus statistics — adjacent character
    * pairs weighted by word frequency (the first BPE merge decision),
    * enumerated over the distinct-word table so pair work is bounded by
    * vocabulary, not corpus size.
    */
  def bpeStats(s: SparkSession, d: String): DataFrame =
    GraftOps.bpePairStats(Tables.documents(s, d), col("text"), k = 50)

  /** Merge rounds for the BPE trainer gates — enough to exercise merged-
    * symbol chaining (later rounds pair PREVIOUS merges), small enough
    * that the unrolled SQL oracle stays readable.
    */
  private val BpeRounds = 6

  /** x_bpe_train: distributed BPE tokenizer training — six greedy merge
    * rounds over the frequency-weighted vocabulary ([[GraftOps.bpeTrain]]).
    * The corpus is scanned once; each round is a vocabulary-bounded pair
    * count + a 1-row argmax, so training cost at 100 TB is per-round
    * vocab work, never corpus work. Gate = the full merge table (round,
    * pair, count) vs a 6-round unrolled SQL replay — every greedy
    * decision and tie-break must match bit-for-bit.
    */
  def bpeTrainQ(s: SparkSession, d: String): DataFrame =
    GraftOps.bpeTrain(Tables.documents(s, d), col("text"), rounds = BpeRounds)

  /** x_bpe_apply: tokenizer serve path — the merges learned by
    * [[bpeTrainQ]] applied corpus-wide as chained string replaces
    * (zero-shuffle map stage). The collect is the bounded merge table
    * (6 rows), the standard model-broadcast shape. Gate = per-doc token
    * count + segmentation md5, so every merge boundary must agree.
    */
  def bpeApplyQ(s: SparkSession, d: String): DataFrame = {
    val merges = GraftOps.bpeTrain(Tables.documents(s, d), col("text"),
        rounds = BpeRounds)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    GraftOps.bpeApply(Tables.documents(s, d), col("doc_id"), col("text"),
      merges)
  }

  /** x_tok_fertility: tokenizer fertility per source ([[GraftOps
    * .bpeFertility]]) — pieces per word occurrence under the SAME merge
    * table x_bpe_apply serves, as exact integer ppm, plus the
    * unsplit-word count. The training-token inflation readout a mixture
    * designer reads next to the per-source doc counts; segmentation
    * cost is distinct-word-bounded.
    */
  def tokFertility(s: SparkSession, d: String): DataFrame = {
    val merges = GraftOps.bpeTrain(Tables.documents(s, d), col("text"),
        rounds = BpeRounds)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    GraftOps.bpeFertility(Tables.documents(s, d), col("source"),
      col("text"), merges)
  }

  /** x_rank_fusion: hybrid retrieval — BM25 top-20 (lexical) fused with
    * cosine top-20 against the vec_id-0 probe (dense, doc_id == vec_id in
    * the fixtures) by exact-integer reciprocal-rank fusion.
    */
  def rankFusion(s: SparkSession, d: String): DataFrame = {
    val lex = GraftOps.bm25Rank(Tables.documents(s, d), col("doc_id"),
      col("text"), terms = Seq("spark", "table", "merge"), k = 20)
    val dense = GraftOps.denseTopK(Tables.embeddings(s, d), col("vec_id"),
        col("embedding"), probeKey = 0L, k = 20)
      .select(col("vec_id").as("doc_id"), col("rank"))
    GraftOps.rrfFuse(lex, dense, k = 10)
  }

  /** x_knn_graph: the corpus-wide k-NN graph (k=5) over embeddings,
    * candidates bounded to each vector's IVF cell — the pre-clustering /
    * graph-dedup neighborhood structure at O(n^1.5), never n^2.
    */
  def knnGraph(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    GraftOps.knnGraph(emb, k = 5, nlist = GraftOps.nlistFor(emb.count()))
  }

  /** x_knn_graph_probe: the same graph with nprobe=2 — every vector also
    * searches its second-nearest cell, the standard recall lever when the
    * owner-cell bound misses boundary neighbors. Candidates stay
    * O(nprobe·n^1.5); the oracle replays the probe ranking exactly.
    */
  def knnGraphProbe(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    GraftOps.knnGraph(emb, k = 5, nlist = GraftOps.nlistFor(emb.count()),
      nprobe = 2)
  }

  /** x_hard_neg: hard-negative mining for contrastive training — each
    * vector's 3 most-similar DIFFERENT-label neighbors, candidates
    * bounded to the IVF owner cell like x_knn_graph. The pairs a
    * bi-encoder trains against; random negatives are too easy to teach
    * the boundary.
    */
  def hardNeg(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    GraftOps.hardNegatives(emb, k = 3, nlist = GraftOps.nlistFor(emb.count()))
  }

  /** x_sample_diverse: coreset selection — the 2 most central vectors of
    * every occupied IVF cell, covering each direction of embedding space
    * instead of oversampling dense regions. The post-dedup downsampling
    * pass of a training-data pipeline.
    */
  def sampleDiverse(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    GraftOps.diverseSample(emb, nlist = GraftOps.nlistFor(emb.count()),
      perCell = 2)
  }

  /** x_shuffle_epochs: deterministic 2-epoch training-order shuffle —
    * every doc gets a pseudo-random position per epoch from a
    * multiplicative hash in exact BIGINT math, so the training order is
    * uniform, epoch-independent, and bit-replayable (resumable runs).
    * One explode + one balanced range sort; no global row_number.
    */
  def shuffleEpochs(s: SparkSession, d: String): DataFrame =
    GraftOps.epochShuffle(Tables.documents(s, d), col("doc_id"), epochs = 2)

  /** x_curriculum: easy-to-hard training schedule — quality-score bins
    * (cleanest first) with a deterministic intra-bin shuffle; the
    * schedule every doc lands in is exact-integer replayable.
    */
  def curriculum(s: SparkSession, d: String): DataFrame =
    GraftOps.curriculumOrder(Tables.documents(s, d), col("doc_id"), col("text"))

  /** x_mix_temp: temperature-scaled domain mixing (α = 0.5) — each
    * source's share of a quarter-corpus token budget is proportional to
    * sqrt(its token total); exact milliweight + rational-ppm math makes
    * the sampled set oracle-replayable.
    */
  def mixTemp(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(TextFns.tokens(col("text"))).as("nt"))
    GraftOps.mixTemperature(docs, col("doc_id"), col("source"), col("nt"))
  }

  /** Mixture-budget knobs, shared between [[mixBudgetQ]] and its
    * oracle (the Uni-/Suf-knob discipline). The weight formula —
    * (source_index + 1) · 10^6 div 210, source index parsed off the
    * 'srcK' label — is repeated arithmetically in the oracle SQL; the
    * two are equivalent by the shared integer division.
    */
  private val MixBudgetTokens = 100000L
  private val MixMaxEpochsPpm = 2500000L

  /** x_mix_budget: token-budget mixture allocation ([[GraftOps
    * .mixBudget]]) — per source grant min(weight·budget,
    * avail·2.5 epochs) tokens and report the exact epochs_ppm +
    * shortfall. At sf0.01 the high-weight sources hit the epoch cap
    * (shortfall > 0) while at sf0.1 nothing does — the gate covers
    * both regimes across the driver's two scale factors. The weight
    * table also plans 'src_missing' (5% share), a source the corpus
    * does NOT contain: its avail=0/granted=0/shortfall=target row is
    * load-bearing in the hash gate, pinning the planned-but-absent
    * visibility contract.
    */
  def mixBudgetQ(s: SparkSession, d: String): DataFrame =
    GraftOps.mixBudget(Tables.documents(s, d), col("source"), col("text"),
      weightsPpm = (0 to 19).map(k => (s"src$k", (k + 1) * 1000000L / 210))
        :+ ("src_missing" -> 50000L),
      budgetTokens = MixBudgetTokens, maxEpochsPpm = MixMaxEpochsPpm)

  /** x_pmi: adjacent-pair PMI over the corpus — top-50 collocations above
    * a 5-occurrence noise floor, ranked on the exact pair count.
    */
  def pmi(s: SparkSession, d: String): DataFrame =
    GraftOps.pmiPairs(Tables.documents(s, d), col("text"), k = 50,
      minCount = 5)

  /** x_dedup_bloom: Bloom-accelerated incremental exact dedup — the
    * delta batch (doc_id ≡ 0 mod 3) keeps only fingerprints absent from
    * the history (the other two thirds). Bitmap misses — most of a
    * mostly-new batch — ship with zero shuffle ([[GraftOps.bloomAntiJoin]]);
    * only bitmap hits run the exact anti-join. Oracle is the plain
    * NOT-EXISTS, so a Bloom false negative (a dup that leaks through) or
    * an unrescued false positive (a new doc wrongly dropped) fails the
    * hash.
    */
  def dedupBloom(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    GraftOps.bloomAntiJoin(
      docs.filter(col("doc_id") % 3 === 0),
      col("fp"),
      docs.filter(col("doc_id") % 3 =!= 0),
      col("fp"))
  }

  /** x_cooccur: windowed (±3) skip-gram co-occurrence counts — top-50
    * unordered token pairs above a 5-occurrence floor, the word2vec /
    * GloVe corpus statistic ([[GraftOps.cooccurPairs]]).
    */
  def cooccur(s: SparkSession, d: String): DataFrame =
    GraftOps.cooccurPairs(Tables.documents(s, d), col("text"), window = 3,
      k = 50, minCount = 5)

  /** x_vocab: vocabulary coverage curve — top-100 terms with cumulative
    * ppm share of all token occurrences (tokenizer sizing).
    */
  def vocab(s: SparkSession, d: String): DataFrame =
    GraftOps.vocabCoverage(Tables.documents(s, d), col("text"), k = 100)

  /** x_len_hist: token-length histogram in 32-token buckets with per-
    * bucket doc share (context-length / packing-strategy reporting).
    */
  def lenHist(s: SparkSession, d: String): DataFrame =
    GraftOps.lengthHistogram(Tables.documents(s, d), col("text"), width = 32)

  /** x_kmeans: one spherical-k-means refinement round over the IVF
    * coarse quantizer (sampled init, nlist ~ sqrt(n)), exploded to
    * (cid, pos, component) with the component rounded at 6 — the gate
    * proves both engines assign identical cells AND agree on every
    * centroid coordinate of the update.
    */
  def kmeans(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val nlist = GraftOps.nlistFor(emb.count())
    val cent = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"),
        graft.functions.VectorFns.toDoubles(col("embedding")).as("cv"))
    GraftOps.kmeansRefine(emb, cent)
      .select(col("cid"), posexplode(col("cv")).as(Seq("pos", "comp")))
      .select(col("cid"), col("pos"), round(col("comp"), 6).as("cv"))
  }

  /** x_pipeline_clean: the round-4 cleaning composition — exact dedup
    * (canonical survivor), substring-level boilerplate drop (docs >= 20%
    * duplicated 16-token spans, computed over the ALREADY-deduped corpus
    * — the realistic order: exact copies out first so span counts
    * reflect distinct docs), C4/Gopher quality gate, then per-source doc
    * and token accounting. Every stage keeps its standalone scale shape;
    * the composition adds only doc_id equi/anti joins.
    */
  def pipelineClean(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val canon = GraftOps.dedupExact(docs, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    // The deduped corpus feeds TWO text passes (span flagging, quality)
    // — cache it so the dedupExact shuffle and the docs⋈canon join run
    // once, not once per consumer (measured 2.9s -> per-stage-sum at
    // sf0.1; the inter-stage materialization every multi-pass curation
    // pipeline pays, and the reason production runs checkpoint between
    // stages).
    val d1 = GraftOps.cacheOnce(docs.join(canon, "doc_id"))
    val flagged = GraftOps.dedupSubstrings(d1, col("doc_id"), col("text"),
        window = 16)
      .filter(col("flagged") === 1).select(col("doc_id"))
    val d2 = d1.join(flagged, Seq("doc_id"), "left_anti")
    // survivor spine persisted (doc-id + token count, text-free): the
    // per-source rollup below re-reads it instead of re-running the
    // span-flag and quality text passes — the d1 discipline one stage
    // later
    val kept = GraftOps.cacheOnce(
      GraftOps.qualityScore(d2, col("doc_id"), col("text"))
        .filter(col("keep") === 1)
        .select(col("doc_id"), col("n_tokens")))
    // per-source accounting joins the survivor ids back to a COLUMN-
    // PRUNED docs scan (doc_id, source — no text): kept ⊆ d2 ⊆ docs by
    // construction, so this is exact and avoids a third full-text pass
    kept.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
  }

  /** x_cluster_topics: corpus topic discovery — label every document
    * with its IVF cluster ([[GraftOps.clusterAssign]], sampled-init
    * coarse quantizer, same tie-break the x_kmeans gate proves), then
    * report each cluster's top-5 terms by frequency (stopwords out, the
    * qualityScore stoplist). The "what is IN my corpus" report a
    * curation run ends with. Shapes: bounded centroid broadcast +
    * map-side argmax (one row per vector shuffles), doc equi-join, one
    * (cell, term) count shuffle, per-cell top-k window on the
    * vocab-bounded count table.
    */
  def clusterTopics(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val nlist = GraftOps.nlistFor(emb.count())
    val cent = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"),
        graft.functions.VectorFns.toDoubles(col("embedding")).as("cv"))
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    val labeled = GraftOps.clusterAssign(emb, cent)
      .join(Tables.documents(s, d), col("vec_id") === col("doc_id"))
      .select(col("cell"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
      .filter(!col("term").isin(stops: _*))
      .groupBy(col("cell"), col("term")).agg(count(lit(1)).as("n_occurrences"))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("n_occurrences").desc, col("term").asc)
    labeled.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
  }

  /** x_sample_weighted: weighted sampling WITHOUT replacement, k docs per
    * source, inclusion probability ∝ n_chars — the Efraimidis–Spirakis
    * exponential-keys scheme. Each doc draws a deterministic uniform
    * u ∈ (0, 1] from md5(doc_id) (the q_filter_sample discipline: re-runs
    * and the oracle replay the same sample) and is ranked by
    * ln(u)/weight; the top-k per group IS a weight-proportional
    * without-replacement sample (Efraimidis & Spirakis 2006).
    *
    * Why this shape at 100 TB: one pass, no per-group state, no
    * rejection loop — a window top-k per group (or TopKByScore for the
    * giant-group case). The md5→(0,1] map is exact in doubles (48-bit
    * integer / 2⁴⁸ — both < 2⁵³), so the only cross-engine float risk is
    * ln() ulp drift flipping two NEARLY-IDENTICAL keys; md5 keys are
    * well-separated at fixture scale.
    */
  private def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    val K = 5
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long") + 1).cast("double") / lit(281474976710656.0) // 2^48
    val rn = row_number().over(
      Window.partitionBy(col("source"))
        .orderBy(col("es_key").desc, col("doc_id")))
    Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .withColumn("es_key", log(u) / col("n_chars"))
      .withColumn("rn", rn)
      .filter(col("rn") <= K)
      .select(col("source"), col("doc_id"), col("n_chars"))
  }

  /** x_pq / x_pq_adc: product quantization over the embeddings table —
    * 64 dims as 8 subspaces × 8 dims, 16 codewords each (codes are 8
    * nibbles per vector, a 64× cut vs float32). ADC probes are the
    * first 4 vectors searching the full corpus, k=5.
    */
  private val PqM = 8
  private val PqSubDim = 8
  private val PqKsub = 16

  private def pq(s: SparkSession, d: String): DataFrame =
    GraftOps.pqEncode(Tables.embeddings(s, d), PqM, PqSubDim, PqKsub)

  private def pqAdc(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    GraftOps.pqSearch(emb, emb.filter(col("vec_id") < 4), k = 5,
      PqM, PqSubDim, PqKsub)
  }

  /** x_dp_counts: ε=1 Laplace-mechanism count release per source — the
    * differential-privacy mechanism a dataset card applies before
    * publishing volumes (count sensitivity 1 ⇒ Laplace(1/ε) noise).
    * The noise draw is DETERMINISTIC (md5(source) → uniform → inverse
    * CDF), the q_filter_sample replay discipline: a re-run or audit
    * reproduces the released numbers exactly. A production release
    * would use a sealed random seed instead — the mechanism, shapes
    * and inverse-CDF math are identical. u ∈ (0,1) strictly: the
    * +0.5/2⁴⁸ offset keeps both ln() arguments positive.
    */
  private def dpCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("u",
        (conv(substring(md5(col("source")), 1, 12), 16, 10)
          .cast("long").cast("double") + 0.5) / lit(281474976710656.0))
      .select(col("source"),
        round(col("n") +
          expr("-1.0 * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))"), 6)
          .as("noisy_n"))

  /** x_bootstrap: Poisson-bootstrap band for the per-source mean doc
    * length — the uncertainty a dataset card should publish next to its
    * point estimates. 32 replicas, band = 2nd/31st replica-mean order
    * statistics (≈ a 94% interval).
    */
  private def bootstrap(s: SparkSession, d: String): DataFrame =
    GraftOps.bootstrapCi(Tables.documents(s, d), col("source"),
      col("doc_id"), col("n_chars"), reps = 32)
      .withColumnRenamed("grp", "source")

  /** x_pca: top principal direction of the embedding corpus by two
    * power-iteration rounds (uncentered Gram eigenvector) — the
    * isotropy / dominant-axis diagnostic.
    */
  private def pca(s: SparkSession, d: String): DataFrame =
    GraftOps.topComponent(Tables.embeddings(s, d), dim = 64, iters = 2)

  /** x_ngram_novelty: marginal-novelty curve ([[GraftOps.ngramNovelty]])
    * — novel-3-gram-occurrence ppm per doc_id-decile, the "does the next
    * snapshot still add anything" readout.
    */
  def ngramNoveltyQ(s: SparkSession, d: String): DataFrame =
    GraftOps.ngramNovelty(Tables.documents(s, d), col("doc_id"), col("text"))

  /** x_embed_health: per-label embedding-corpus health report
    * ([[GraftOps.embedHealth]]) — norm spread, raw-centroid norm
    * (anisotropy), mean cosine to centroid; the pre-flight before any
    * ANN build over these vectors.
    */
  def embedHealthQ(s: SparkSession, d: String): DataFrame =
    GraftOps.embedHealth(Tables.embeddings(s, d), col("vec_id"),
      col("embedding"), col("label"))

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "x_ngram_novelty" -> ngramNoveltyQ,
    "x_embed_health" -> embedHealthQ,
    "x_pca" -> pca,
    "x_bootstrap" -> bootstrap,
    "x_dp_counts" -> dpCounts,
    "x_pq" -> pq,
    "x_pq_adc" -> pqAdc,
    "x_sample_weighted" -> sampleWeighted,
    "x_pipeline_clean" -> pipelineClean,
    "x_cluster_topics" -> clusterTopics,
    "x_kmeans" -> kmeans,
    "x_pmi" -> pmi,
    "x_cooccur" -> cooccur,
    "x_dedup_bloom" -> dedupBloom,
    "x_vocab" -> vocab,
    "x_len_hist" -> lenHist,
    "x_frame_sample" -> frameSample,
    "x_dedup_para" -> dedupPara,
    "x_mix_domain" -> mixDomain,
    "x_bm25" -> bm25,
    "q_cdc_merge" -> cdcMerge,
    "x_dedup_incr" -> dedupIncr,
    "x_perplexity" -> perplexity,
    "x_perplexity_bi" -> perplexityBi,
    "x_perplexity_interp" -> perplexityInterp,
    "x_perplexity_kn" -> perplexityKn,
    "x_dataset_split" -> datasetSplit,
    "x_nb_langid" -> nbLangId,
    "x_lang_seg" -> langSegQ,
    "x_eval_metrics" -> evalMetricsQ,
    "x_ccnet" -> ccnet,
    "x_outlier_embed" -> outlierEmbed,
    "x_dedup_embed_cluster" -> dedupEmbedCluster,
    "x_dedup_substr" -> dedupSubstr,
    "x_dedup_url" -> dedupUrlQ,
    "x_url_filter" -> urlFilterQ,
    "x_robots" -> robotsQ,
    "x_boilerplate" -> boilerplateQ,
    "x_anchor_text" -> anchorTextQ,
    "x_redirect_resolve" -> redirectResolveQ,
    "x_sitemap" -> sitemapQ,
    "x_dedup_suffix" -> dedupSuffixQ,
    "x_dedup_suffix_deep" -> dedupSuffixDeepQ,
    "x_dedup_onion" -> dedupOnionQ,
    "x_unigram_train" -> unigramTrainQ,
    "x_unigram_apply" -> unigramApplyQ,
    "x_bpe_stats" -> bpeStats,
    "x_bpe_train" -> bpeTrainQ,
    "x_bpe_apply" -> bpeApplyQ,
    "x_tok_fertility" -> tokFertility,
    "x_rank_fusion" -> rankFusion,
    "x_knn_graph" -> knnGraph,
    "x_knn_graph_probe" -> knnGraphProbe,
    "x_hard_neg" -> hardNeg,
    "x_sample_diverse" -> sampleDiverse,
    "x_shuffle_epochs" -> shuffleEpochs,
    "x_curriculum" -> curriculum,
    "x_mix_temp" -> mixTemp,
    "x_mix_budget" -> mixBudgetQ,
    "x_split_nodup" -> splitNodup,
    "x_kl_drift" -> klDriftQ,
    "x_html_strip" -> htmlStrip,
    "x_zipf" -> zipfQ,
    "x_heaps" -> heapsQ
  )

  /** Explicit 1-based L2 term sum for the PQ oracles — the same
    * left-to-right fold the engine's pqL2 performs, so double parity is
    * structural.
    */
  private def pqTerms(a: String, b: String): String =
    (1 to PqSubDim).map(i => s"($a[$i]-$b[$i])*($a[$i]-$b[$i])").mkString(" + ")

  private val pqCommon =
    s"""WITH emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |ms AS (SELECT unnest(range($PqM)) AS sub),
       |subs AS (
       |  SELECT vec_id, sub,
       |    list_slice(v, CAST(sub*$PqSubDim+1 AS INTEGER),
       |      CAST(sub*$PqSubDim+$PqSubDim AS INTEGER)) AS sv
       |  FROM emb CROSS JOIN ms),
       |cb AS (SELECT sub, vec_id AS code, sv AS cv FROM subs WHERE vec_id < $PqKsub),
       |d AS (
       |  SELECT s.vec_id, s.sub, c.code, ${pqTerms("s.sv", "c.cv")} AS dist
       |  FROM subs s JOIN cb c ON s.sub = c.sub),
       |r AS (
       |  SELECT vec_id, sub, code,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
       |  FROM d),
       |codes AS (SELECT vec_id, sub, code FROM r WHERE rn = 1)""".stripMargin

  /** Shared IVF cell-assignment CTE prefix (sqrt(n) centroid derivation +
    * max-cosine / higher-cid tie-break argmax), interpolated into every
    * oracle that replays assignCells — ONE copy, so a tie-break or nlist
    * change cannot silently desync a subset of gates (the minhashCommon
    * discipline in LlmQueries).
    */
  private val ivfCommon =
    """WITH nl AS (SELECT min(c) c FROM range(1, 100000) t(c)
        |  WHERE c*c >= (SELECT count(*) FROM embeddings)),
        |emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |cent AS (SELECT vec_id cid, v cv FROM emb, nl WHERE vec_id < c),
        |asg AS (SELECT vec_id, v, cid AS cell FROM (
        |  SELECT e.vec_id, e.v, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, c.cv)
        |        / (sqrt(list_dot_product(e.v, e.v))
        |           * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |      c.cid DESC) rn
        |  FROM emb e CROSS JOIN cent c) WHERE rn = 1)""".stripMargin

  /** Unrolled BPE training replay for the x_bpe_train / x_bpe_apply
    * oracles: w0 = the wrapped-symbol vocabulary, then per round i a pair
    * count (pI), the greedy argmax (mI — count desc, then lexicographic
    * lhs/rhs), and the merged vocabulary (wI) via the same left-to-right
    * non-overlapping `replace` the engine uses. Generated, not hand-
    * written, so the round count stays in one place ([[BpeRounds]]).
    */
  private def bpeOracleCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS (
        |  SELECT regexp_replace(word, '(.)', '<\1>', 'g') syms, freq FROM (
        |    SELECT word, count(*) freq FROM (
        |      SELECT unnest([w for w in
        |        string_split_regex(lower(trim(text)), '\s+') if w != '']) word
        |      FROM documents) GROUP BY word))""".stripMargin)
    for (i <- 1 to rounds) {
      sb.append(s""",
        |p$i AS (
        |  SELECT u.lhs lhs, u.rhs rhs, CAST(sum(freq) AS BIGINT) cnt FROM (
        |    SELECT freq, unnest([{'lhs': t[i], 'rhs': t[i+1]}
        |      for i in range(1, len(t))]) u
        |    FROM (SELECT freq,
        |            string_split(substr(syms, 2, length(syms) - 2), '><') t
        |          FROM w${i - 1}) s)
        |  GROUP BY u.lhs, u.rhs),
        |m$i AS (SELECT lhs, rhs, cnt FROM p$i ORDER BY cnt DESC, lhs, rhs LIMIT 1),
        |w$i AS (
        |  SELECT replace(syms,
        |    (SELECT '<' || lhs || '><' || rhs || '>' FROM m$i),
        |    (SELECT '<' || lhs || rhs || '>' FROM m$i)) syms, freq
        |  FROM w${i - 1})""".stripMargin)
    }
    sb.toString
  }

  /** Statically-unrolled Viterbi DP for the unigram-LM oracles: one CTE
    * per character position (up to [[UniMaxWordLen]]) carrying a sliding
    * window of the last [[UniMaxPiece]] DP states; candidate pieces are
    * LEFT-JOIN lookups against the round's integer weight table and the
    * best candidate comes out of a struct sort (score DESC, then the
    * lexicographically greatest segmentation — the engine's array_max
    * tie-break, mirrored structurally). Emits d{tag}_0..N plus
    * seg{tag}(word, freq, g); every score is a BIGINT micro-log, so the
    * replay is exact integer arithmetic.
    */
  private def uniDp(tag: String, wTbl: String): String = {
    val zero =
      s"""d${tag}_0 AS MATERIALIZED (
         |  SELECT word, freq, len(word) n, CAST(0 AS BIGINT) sc, '' gc,
         |    CAST(NULL AS BIGINT) s1, CAST(NULL AS VARCHAR) g1,
         |    CAST(NULL AS BIGINT) s2, CAST(NULL AS VARCHAR) g2,
         |    CAST(NULL AS BIGINT) s3, CAST(NULL AS VARCHAR) g3
         |  FROM wf)""".stripMargin
    val steps = (1 to UniMaxWordLen).map { i =>
      val ks = 1 to math.min(UniMaxPiece, i)
      val joins = ks.map(k =>
        s"    LEFT JOIN $wTbl p$k ON p$k.piece = substr(v.word, ${i - k + 1}, $k)")
        .mkString("\n")
      val cands = ks.map { k =>
        val (ps, pg) =
          if (k == 1) ("v.sc", "v.gc") else (s"v.s${k - 1}", s"v.g${k - 1}")
        s"CASE WHEN p$k.wt IS NOT NULL AND $ps IS NOT NULL THEN " +
          s"{'s': $ps + p$k.wt, " +
          s"'g': $pg || '<' || substr(v.word, ${i - k + 1}, $k) || '>'} END"
      }.mkString(",\n        ")
      s"""d${tag}_$i AS MATERIALIZED (
         |  SELECT word, freq, n, best['s'] sc, best['g'] gc,
         |    psc s1, pgc g1, ps1 s2, pg1 g2, ps2 s3, pg2 g3
         |  FROM (
         |    SELECT v.word, v.freq, v.n,
         |      list_sort([c for c in [
         |        $cands
         |      ] if c IS NOT NULL], 'DESC')[1] best,
         |      v.sc psc, v.gc pgc, v.s1 ps1, v.g1 pg1, v.s2 ps2, v.g2 pg2
         |    FROM d${tag}_${i - 1} v
         |$joins
         |  ))""".stripMargin
    }
    val seg = s"seg$tag AS MATERIALIZED (\n  " +
      (1 to UniMaxWordLen).map(i =>
        s"SELECT word, freq, gc g FROM d${tag}_$i WHERE n = $i")
        .mkString("\n  UNION ALL ") + ")"
    (zero +: steps :+ seg).mkString(",\n")
  }

  /** Shared unigram-LM oracle prefix: tokenize → distinct-word
    * frequencies → substring-seeded vocabulary v0 + initial micro-log
    * weights w0 → [[UniRounds]] unrolled hard-EM rounds (DP, piece
    * counts, add-one re-weighting) → the pruned final table `pr` and
    * its smoothing denominator `den`. Generated so the knobs live in
    * ONE place next to the gated queries.
    */
  private def uniCommon: String = {
    val rounds = (1 to UniRounds).map { r =>
      val w = if (r == 1) "w0" else s"w${r - 1}"
      uniDp(s"r$r", w) +
        s""",
           |cntr$r AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) c FROM (
           |  SELECT freq,
           |    unnest(string_split(substr(g, 2, len(g) - 2), '><')) piece
           |  FROM segr$r) GROUP BY 1),
           |w$r AS MATERIALIZED (
           |  SELECT v0.piece,
           |    CAST(round(ln((coalesce(c.c, 0) + 1) /
           |      ((SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) FROM cntr$r)
           |        + (SELECT count(*) FROM v0))) * 1000000, 0) AS BIGINT) wt
           |  FROM v0 LEFT JOIN cntr$r c USING (piece))""".stripMargin
    }.mkString(",\n")
    s"""WITH ws AS MATERIALIZED (
       |  SELECT doc_id,
       |    [w for w in string_split_regex(trim(lower(text)), '\\s+') if w != ''] w
       |  FROM documents),
       |wf AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) freq FROM (
       |  SELECT unnest(w) word FROM ws) GROUP BY 1),
       |seed AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) cnt FROM (
       |  SELECT freq, substr(word, i, l) piece
       |  FROM wf, unnest(generate_series(1, len(word))) t(i),
       |       unnest(generate_series(1, $UniMaxPiece)) u(l)
       |  WHERE i + l - 1 <= len(word)) GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT piece, cnt FROM seed WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) rn
       |    FROM seed WHERE len(piece) > 1) WHERE rn <= $UniSeedMultis),
       |w0 AS MATERIALIZED (SELECT piece,
       |  CAST(round(ln(CAST(cnt AS DOUBLE) /
       |    (SELECT CAST(sum(cnt) AS DOUBLE) FROM v0)) * 1000000, 0) AS BIGINT) wt
       |  FROM v0),
       |$rounds,
       |pr AS MATERIALIZED (
       |  SELECT v0.piece, coalesce(c.c, 0) c
       |  FROM v0 LEFT JOIN cntr$UniRounds c USING (piece)
       |  WHERE len(v0.piece) = 1
       |  UNION ALL
       |  SELECT piece, c FROM (
       |    SELECT v0.piece, coalesce(c.c, 0) c,
       |      row_number() OVER (ORDER BY coalesce(c.c, 0) DESC, v0.piece) rn
       |    FROM v0 LEFT JOIN cntr$UniRounds c USING (piece)
       |    WHERE len(v0.piece) > 1)
       |  WHERE rn <= $UniTarget -
       |    (SELECT count(*) FROM v0 WHERE len(piece) = 1)),
       |den AS MATERIALIZED (SELECT CAST(sum(c) AS DOUBLE) + count(*) d FROM pr)""".stripMargin
  }

  /** Full NB prediction replay — shared by the x_nb_langid gate and
    * (as a nested derived table) the x_eval_metrics rollup.
    */
  private val nbOracleSql =
    """WITH base AS (
      |  SELECT doc_id, lang lbl,
      |    [w for w in string_split_regex(lower(trim(text)), '\s+')
      |     if w != ''] w
      |  FROM documents),
      |b AS (SELECT doc_id, lbl, w FROM base WHERE len(w) > 0),
      |tall AS (SELECT doc_id, term, count(*) tf FROM (
      |  SELECT doc_id, unnest(w) term FROM b) GROUP BY 1, 2),
      |dt AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) n_tok
      |  FROM tall GROUP BY 1),
      |ct AS (SELECT lbl, term, count(*) c FROM (
      |  SELECT lbl, unnest(w) term FROM b) GROUP BY 1, 2),
      |cl AS (
      |  SELECT lbl, n_docs_c, t_c FROM
      |    (SELECT lbl, count(*) n_docs_c FROM b GROUP BY 1)
      |    JOIN (SELECT lbl, CAST(sum(c) AS BIGINT) t_c
      |          FROM ct GROUP BY 1) USING (lbl)),
      |tot AS (SELECT (SELECT count(*) FROM b) n_docs,
      |  (SELECT count(DISTINCT term) FROM tall) v),
      |pos AS (
      |  SELECT doc_id, ct.lbl, sum(tf * ln(c + 1.0)) possum
      |  FROM tall JOIN ct USING (term) GROUP BY 1, 2),
      |sc AS (
      |  SELECT dt.doc_id, cl.lbl,
      |    round(ln(n_docs_c) - ln(n_docs) - n_tok * ln(t_c + v)
      |      + coalesce(possum, 0.0), 6) score
      |  FROM dt CROSS JOIN cl CROSS JOIN tot
      |  LEFT JOIN pos ON pos.doc_id = dt.doc_id AND pos.lbl = cl.lbl),
      |pr AS (
      |  SELECT doc_id, lbl predicted FROM (
      |    SELECT doc_id, lbl, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, lbl DESC) rn FROM sc) WHERE rn = 1)
      |SELECT b.doc_id, b.lbl AS actual, predicted,
      |  CAST(b.lbl = predicted AS INT) AS correct
      |FROM b JOIN pr USING (doc_id)""".stripMargin

  val oracle = Map(
    // Novelty replay: identical 3-gram construction (duplicates
    // preserved), min-doc_id first occurrence, exact integer decile off
    // the corpus min/max, novel ppm per bucket.
    "x_ngram_novelty" ->
      raw"""WITH ws AS (SELECT doc_id,
        |    [w for w in string_split_regex(trim(lower(text)), '\s+') if w != ''] w
        |  FROM documents),
        |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] gram
        |  FROM ws, unnest(generate_series(1, len(w) - 2)) t(i)
        |  WHERE len(w) >= 3),
        |f AS (SELECT gram, min(doc_id) first_doc FROM g GROUP BY 1),
        |span AS (SELECT min(doc_id) lo, max(doc_id) hi FROM documents)
        |SELECT least(9, (doc_id - lo) * 10 // (hi - lo + 1)) bucket,
        |  count(DISTINCT doc_id) n_docs, count(*) n_occ,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    n_novel,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) novelty_ppm
        |FROM g JOIN f USING (gram) CROSS JOIN span
        |GROUP BY 1""".stripMargin,
    // Health replay: double-widened vectors (the PQ discipline), raw
    // per-pos centroid means, list_dot_product norms/cosines, round(6).
    "x_embed_health" ->
      """WITH emb AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |cent AS (SELECT label, list(m ORDER BY pos) cv FROM (
        |    SELECT label, i pos, sum(v[i]) / count(*) m
        |    FROM emb, unnest(generate_series(1, len(v))) t(i)
        |    GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT label, count(*) n_vecs, max(len(v)) dim,
        |  round(avg(sqrt(list_dot_product(v, v))), 6) mean_norm,
        |  round(min(sqrt(list_dot_product(v, v))), 6) min_norm,
        |  round(max(sqrt(list_dot_product(cv, cv))), 6) centroid_norm,
        |  round(avg(list_dot_product(v, cv) /
        |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))), 6)
        |    mean_cos_centroid
        |FROM emb JOIN cent USING (label) GROUP BY 1""".stripMargin,
    // Metrics rollup over the full NB replay (nested derived table):
    // bounded confusion counts, exact integer ppm, NULL when a class is
    // never predicted — identical CASE guards both engines.
    "x_eval_metrics" ->
      (s"WITH nbout AS (\n$nbOracleSql\n),\n" +
        """conf AS (
          |  SELECT actual, predicted, count(*) n FROM nbout GROUP BY 1, 2),
          |tp AS (SELECT actual AS cls, CAST(n AS BIGINT) tp
          |  FROM conf WHERE actual = predicted),
          |act AS (SELECT actual AS cls, CAST(sum(n) AS BIGINT) n_actual
          |  FROM conf GROUP BY 1),
          |prd AS (SELECT predicted AS cls, CAST(sum(n) AS BIGINT) n_predicted
          |  FROM conf GROUP BY 1)
          |SELECT cls,
          |  coalesce(n_actual, 0) AS n_actual,
          |  coalesce(n_predicted, 0) AS n_predicted,
          |  coalesce(tp, 0) AS tp,
          |  CASE WHEN coalesce(n_predicted, 0) = 0 THEN NULL
          |       ELSE CAST((coalesce(tp, 0) * 1000000) // n_predicted AS BIGINT)
          |  END AS precision_ppm,
          |  CASE WHEN coalesce(n_actual, 0) = 0 THEN NULL
          |       ELSE CAST((coalesce(tp, 0) * 1000000) // n_actual AS BIGINT)
          |  END AS recall_ppm
          |FROM act FULL OUTER JOIN prd USING (cls)
          |LEFT JOIN tp USING (cls)""".stripMargin),
    // Two unrolled power-iteration rounds: iter-1's direction is the
    // all-ones vector, so its dot product IS list_sum(x); per-dimension
    // sums replay the engine's float accumulation within round-6 margin
    // (the x_kmeans discipline).
    "x_pca" ->
      """WITH emb AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
        |  FROM embeddings),
        |u1 AS (
        |  SELECT i, sum(x[i] * d) AS s
        |  FROM (SELECT x, list_sum(x) AS d FROM emb),
        |    unnest(generate_series(1, 64)) t(i)
        |  GROUP BY i),
        |vv1 AS (
        |  SELECT list_transform(l,
        |    y -> y / sqrt(list_sum(list_transform(l, z -> z*z)))) AS v1
        |  FROM (SELECT list(s ORDER BY i) AS l FROM u1)),
        |d2 AS (
        |  SELECT e.x,
        |    list_sum(list_transform(range(64),
        |      i -> e.x[i+1] * vv1.v1[i+1])) AS d
        |  FROM emb e CROSS JOIN vv1),
        |u2 AS (
        |  SELECT i, sum(x[i] * d) AS s
        |  FROM d2, unnest(generate_series(1, 64)) t(i)
        |  GROUP BY i),
        |vv2 AS (SELECT list(s ORDER BY i) AS l FROM u2)
        |SELECT CAST(i - 1 AS BIGINT) AS pos,
        |  round(l[i] / sqrt(list_sum(list_transform(l, z -> z*z))), 6) AS pc
        |FROM vv2, unnest(generate_series(1, 64)) t(i)""".stripMargin,

    // The Poisson weights replay from the SAME printed threshold
    // literals the engine compiled (GraftOps.PoissonCum interpolated
    // into both sides); replica means are exact-int divisions, the band
    // is pure order statistics — nothing float-accumulated anywhere.
    "x_bootstrap" ->
      s"""WITH bs AS (SELECT unnest(range(32)) AS b),
         |reps AS (
         |  SELECT source, n_chars,
         |    (CAST(('0x' || substr(md5(doc_id || '|' || b), 1, 12))
         |       AS BIGINT) + 0.5) / 281474976710656.0 AS u, b
         |  FROM documents CROSS JOIN bs),
         |wt AS (SELECT source, b, n_chars, ${GraftOps.poissonCase} AS w
         |  FROM reps),
         |means AS (
         |  SELECT source, b,
         |    CAST(sum(w * n_chars) AS BIGINT) / CAST(sum(w) AS BIGINT) AS m
         |  FROM wt GROUP BY 1, 2
         |  HAVING sum(w) > 0),
         |ranked AS (
         |  SELECT source, b, m,
         |    row_number() OVER (PARTITION BY source ORDER BY m, b) AS rlo,
         |    row_number() OVER (PARTITION BY source ORDER BY m DESC, b DESC)
         |      AS rhi
         |  FROM means),
         |est AS (
         |  SELECT source, CAST(sum(n_chars) AS BIGINT) / count(*) AS est
         |  FROM documents GROUP BY 1)
         |SELECT e.source, round(e.est, 6) AS est, round(l.m, 6) AS boot_lo,
         |  round(h.m, 6) AS boot_hi
         |FROM est e
         |JOIN (SELECT source, m FROM ranked WHERE rlo = 2) l USING (source)
         |JOIN (SELECT source, m FROM ranked WHERE rhi = 2) h USING (source)""".stripMargin,

    // Same md5 uniform, same inverse-CDF Laplace draw, same literal
    // constants — the release replays bit-for-bit (round-6 absorbs ln ulp).
    "x_dp_counts" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |k AS (SELECT source, n,
        |  (CAST(('0x' || substr(md5(source), 1, 12)) AS BIGINT) + 0.5)
        |    / 281474976710656.0 AS u
        |  FROM c)
        |SELECT source,
        |  round(n + -1.0 * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 6)
        |    AS noisy_n
        |FROM k""".stripMargin,

    "x_pq" -> s"""$pqCommon
       |SELECT vec_id, sub, code FROM codes""".stripMargin,

    // ADC replay: integer micro-unit LUT, exact integer sums — any
    // divergence in a single floor or tie-break fails the hash.
    // sum(BIGINT) is HUGEINT in DuckDB — cast back (the round-2 lesson).
    "x_pq_adc" -> s"""$pqCommon,
       |pr AS (SELECT vec_id AS probe_id, sub, sv AS psv FROM subs WHERE vec_id < 4),
       |lut AS (
       |  SELECT p.probe_id, c.sub, c.code,
       |    CAST(floor((${pqTerms("p.psv", "c.cv")}) * 1000000) AS BIGINT) AS ld
       |  FROM pr p JOIN cb c ON p.sub = c.sub),
       |ad AS (
       |  SELECT l.probe_id, x.vec_id, CAST(sum(l.ld) AS BIGINT) AS adist_micro
       |  FROM codes x JOIN lut l ON l.sub = x.sub AND l.code = x.code
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT probe_id, vec_id, adist_micro,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY adist_micro, vec_id) AS rnk
       |  FROM ad)
       |SELECT probe_id, vec_id, adist_micro, rnk FROM rk WHERE rnk <= 5""".stripMargin,

    // Same md5-derived uniform, same exponential key, same tiebreak —
    // the oracle replays the exact sample. '0x'||hex CAST is DuckDB's
    // conv(,16,10); both engines then do exact double division by 2^48.
    "x_sample_weighted" ->
      """WITH keyed AS (
        |  SELECT source, doc_id, n_chars,
        |    ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |          AS BIGINT) + 1) / 281474976710656.0) / n_chars AS es_key
        |  FROM documents WHERE n_chars > 0),
        |ranked AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY es_key DESC, doc_id) AS rn
        |  FROM keyed)
        |SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 5""".stripMargin,

    "x_outlier_embed" ->
      """WITH emb AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |nrm AS (SELECT label, vec_id, i pos,
        |    v[i] / sqrt(list_dot_product(v, v)) comp
        |  FROM emb, unnest(generate_series(1, len(v))) t(i)),
        |cent AS (
        |  SELECT label, list(m ORDER BY pos) cv FROM (
        |    SELECT label, pos, sum(comp) / count(*) m FROM nrm GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT vec_id, e.label AS grp,
        |  round(list_dot_product(v, cv)
        |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6)
        |    AS cos_centroid,
        |  CAST(round(list_dot_product(v, cv)
        |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6)
        |    < 0.0 AS INT) AS outlier
        |FROM emb e JOIN cent c ON e.label = c.label""".stripMargin,
    "x_perplexity_bi" ->
      """WITH ws AS (
        |  SELECT doc_id,
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |d AS (SELECT doc_id, w FROM ws WHERE len(w) >= 2),
        |tall AS (SELECT doc_id, w[i] a, w[i + 1] b
        |  FROM d, unnest(generate_series(1, len(w) - 1)) t(i)),
        |pairs AS (SELECT doc_id, a, b, count(*) pf FROM tall GROUP BY 1, 2, 3),
        |bc AS (SELECT a, b, CAST(sum(pf) AS BIGINT) cab FROM pairs GROUP BY 1, 2),
        |u AS (SELECT t, count(*) ca
        |  FROM (SELECT unnest(w) t FROM d) GROUP BY 1),
        |v AS (SELECT count(*) vocab FROM u),
        |sc AS (
        |  SELECT doc_id, CAST(sum(pf) AS BIGINT) n_pairs,
        |    sum(-ln((cab + 1.0) / (ca + vocab)) * pf) nll
        |  FROM pairs JOIN bc USING (a, b) JOIN u ON pairs.a = u.t CROSS JOIN v
        |  GROUP BY 1)
        |SELECT doc_id, n_pairs, round(nll / n_pairs, 6) avg_nll,
        |  round(exp(nll / n_pairs), 6) ppl
        |FROM sc""".stripMargin,
    // NB replay: same score decomposition (only observed (class, term)
    // pairs join; absent pairs contribute ln 1 = 0), same rounding-
    // before-argmax and class-label tie-break.
    "x_nb_langid" -> nbOracleSql,
    // Full replay of the x_lang_seg chain: phrasebook (top-8 tokens per
    // language), next-language pick, page synthesis (own-text slices +
    // the planted foreign paragraph every 3rd doc), the NB model from
    // the SAME derivation as x_nb_langid, per-paragraph argmax (score
    // desc, label desc), and the per-doc modal rollup.
    "x_lang_seg" ->
      raw"""WITH base AS (
        |  SELECT doc_id, lang lbl,
        |    [w for w in string_split_regex(lower(trim(text)), '\s+')
        |     if w != ''] w
        |  FROM documents),
        |b AS (SELECT doc_id, lbl, w FROM base WHERE len(w) > 0),
        |ct AS (SELECT lbl, term, count(*) c FROM (
        |  SELECT lbl, unnest(w) term FROM b) GROUP BY 1, 2),
        |cl AS (
        |  SELECT lbl, n_docs_c, t_c FROM
        |    (SELECT lbl, count(*) n_docs_c FROM b GROUP BY 1)
        |    JOIN (SELECT lbl, CAST(sum(c) AS BIGINT) t_c
        |          FROM ct GROUP BY 1) USING (lbl)),
        |tot AS (SELECT (SELECT count(*) FROM b) n_docs,
        |  (SELECT count(DISTINCT term) FROM ct) v),
        |top8 AS (SELECT lbl lang, term, row_number() OVER (
        |    PARTITION BY lbl ORDER BY c DESC, term ASC) rn FROM ct),
        |ph AS (SELECT lang, array_to_string(list(term ORDER BY rn), ' ')
        |    phrase FROM top8 WHERE rn <= 8 GROUP BY 1),
        |ls AS (SELECT DISTINCT lang FROM documents),
        |nx AS (SELECT a.lang,
        |    coalesce(min(b2.lang), (SELECT min(lang) FROM ls)) next_lang
        |  FROM ls a LEFT JOIN ls b2 ON b2.lang > a.lang GROUP BY a.lang),
        |fp AS (SELECT nx.lang, ph.phrase fphrase
        |  FROM nx JOIN ph ON ph.lang = nx.next_lang),
        |pg AS (
        |  SELECT base.doc_id,
        |    array_to_string(
        |      [coalesce(array_to_string(w[(1 + (j - 1) * 8):(j * 8)], ' '),
        |         '')
        |       for j in range(1, 2 + CAST(base.doc_id % 2 AS INT))],
        |      chr(10)) ||
        |    (CASE WHEN base.doc_id % 3 = 0 THEN chr(10) || fp.fphrase
        |          ELSE '' END) AS page
        |  FROM base JOIN fp ON fp.lang = base.lbl),
        |paras AS (
        |  SELECT doc_id, i - 1 AS para_idx,
        |    [x for x in string_split_regex(lower(trim(ps[i])), '\s+')
        |     if x != ''] pw
        |  FROM (SELECT doc_id, string_split(page, chr(10)) ps FROM pg),
        |    unnest(generate_series(1, len(ps))) t(i)),
        |p AS (SELECT doc_id, para_idx, pw FROM paras WHERE len(pw) > 0),
        |ptall AS (SELECT doc_id, para_idx, term, count(*) tf FROM (
        |  SELECT doc_id, para_idx, unnest(pw) term FROM p)
        |  GROUP BY 1, 2, 3),
        |pt AS (SELECT doc_id, para_idx, CAST(sum(tf) AS BIGINT) n_tok
        |  FROM ptall GROUP BY 1, 2),
        |pos AS (
        |  SELECT doc_id, para_idx, ct.lbl, sum(tf * ln(c + 1.0)) possum
        |  FROM ptall JOIN ct USING (term) GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT pt.doc_id, pt.para_idx, cl.lbl,
        |    round(ln(n_docs_c) - ln(n_docs) - n_tok * ln(t_c + v)
        |      + coalesce(possum, 0.0), 6) score
        |  FROM pt CROSS JOIN cl CROSS JOIN tot
        |  LEFT JOIN pos ON pos.doc_id = pt.doc_id
        |    AND pos.para_idx = pt.para_idx AND pos.lbl = cl.lbl),
        |pr AS (
        |  SELECT doc_id, para_idx, lbl plang FROM (
        |    SELECT doc_id, para_idx, lbl, row_number() OVER (
        |      PARTITION BY doc_id, para_idx
        |      ORDER BY score DESC, lbl DESC) rn FROM sc) WHERE rn = 1),
        |pl AS (SELECT doc_id, plang, count(*) n FROM pr GROUP BY 1, 2),
        |dom AS (SELECT doc_id, plang dominant_lang, n n_dominant FROM (
        |    SELECT doc_id, plang, n, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY n DESC, plang DESC) rn
        |    FROM pl) WHERE rn = 1),
        |agg AS (SELECT doc_id, CAST(sum(n) AS BIGINT) n_paras,
        |    CAST(count(*) AS BIGINT) n_langs FROM pl GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(agg.n_paras, 0) AS n_paras,
        |  coalesce(agg.n_langs, 0) AS n_langs,
        |  coalesce(dom.dominant_lang, '') AS dominant_lang,
        |  CAST(coalesce(dom.n_dominant * 1000000 // agg.n_paras, 0)
        |    AS BIGINT) AS dominant_ppm,
        |  CAST(coalesce(CAST(agg.n_langs >= 2 AS INT), 0) AS INT) AS mixed
        |FROM documents d
        |LEFT JOIN agg ON agg.doc_id = d.doc_id
        |LEFT JOIN dom ON dom.doc_id = d.doc_id""".stripMargin,
    // The split replay: identical 48-bit md5 bucket, identical 32-bit
    // row hashes — the 3-row manifest certifies the whole partition.
    "x_dataset_split" ->
      """WITH a AS (
        |  SELECT
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |           AS BIGINT) % 100 < 98 THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |           AS BIGINT) % 100 < 99 THEN 'val'
        |         ELSE 'test' END AS split,
        |    len([w for w in string_split_regex(lower(trim(text)), '\s+')
        |         if w != '']) AS n_tokens,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 8))
        |      AS BIGINT) AS rh
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(rh) AS BIGINT) AS membership_digest
        |FROM a GROUP BY split""".stripMargin,
    // KN replay: all three statistics (context total + fan-out,
    // continuation count, type total) recomputed from the distinct-bigram
    // table; mixture expression token-identical to the engine's
    // (left-associated, double literals), C(ab) >= 1 > D so no max().
    "x_perplexity_kn" ->
      """WITH ws AS (
        |  SELECT doc_id,
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |d AS (SELECT doc_id, w FROM ws WHERE len(w) >= 2),
        |tall AS (SELECT doc_id, w[i] a, w[i + 1] b
        |  FROM d, unnest(generate_series(1, len(w) - 1)) t(i)),
        |pairs AS (SELECT doc_id, a, b, count(*) pf FROM tall GROUP BY 1, 2, 3),
        |bc AS (SELECT a, b, CAST(sum(pf) AS BIGINT) cab FROM pairs GROUP BY 1, 2),
        |ctx AS (SELECT a, CAST(sum(cab) AS BIGINT) ctot, count(*) n1a
        |  FROM bc GROUP BY 1),
        |contb AS (SELECT b, count(*) n1b FROM bc GROUP BY 1),
        |types AS (SELECT count(*) nbt FROM bc),
        |sc AS (
        |  SELECT doc_id, CAST(sum(pf) AS BIGINT) n_pairs,
        |    sum(-ln((cab - CAST(0.75 AS DOUBLE)) / ctot +
        |      CAST(0.75 AS DOUBLE) * n1a / ctot * n1b / nbt) * pf) nll
        |  FROM pairs JOIN bc USING (a, b) JOIN ctx USING (a)
        |    JOIN contb USING (b) CROSS JOIN types
        |  GROUP BY 1)
        |SELECT doc_id, n_pairs, round(nll / n_pairs, 6) avg_nll,
        |  round(exp(nll / n_pairs), 6) ppl
        |FROM sc""".stripMargin,
    // JM interpolation replay: identical double arithmetic
    // (0.75·cab/ca + 0.25·cb/n, left-associated) and exact-integer
    // counts — the ln-parity discipline of x_perplexity_bi with one
    // more unigram join on the target token.
    "x_perplexity_interp" ->
      """WITH ws AS (
        |  SELECT doc_id,
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |d AS (SELECT doc_id, w FROM ws WHERE len(w) >= 2),
        |tall AS (SELECT doc_id, w[i] a, w[i + 1] b
        |  FROM d, unnest(generate_series(1, len(w) - 1)) t(i)),
        |pairs AS (SELECT doc_id, a, b, count(*) pf FROM tall GROUP BY 1, 2, 3),
        |bc AS (SELECT a, b, CAST(sum(pf) AS BIGINT) cab FROM pairs GROUP BY 1, 2),
        |u AS (SELECT t, count(*) c
        |  FROM (SELECT unnest(w) t FROM d) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) n FROM u),
        |sc AS (
        |  SELECT doc_id, CAST(sum(pf) AS BIGINT) n_pairs,
        |    sum(-ln(0.75 * cab / ca + 0.25 * cb / n) * pf) nll
        |  FROM pairs JOIN bc USING (a, b)
        |    JOIN (SELECT t, c ca FROM u) ua ON pairs.a = ua.t
        |    JOIN (SELECT t, c cb FROM u) ub ON pairs.b = ub.t
        |    CROSS JOIN tot
        |  GROUP BY 1)
        |SELECT doc_id, n_pairs, round(nll / n_pairs, 6) avg_nll,
        |  round(exp(nll / n_pairs), 6) ppl
        |FROM sc""".stripMargin,

    "x_pipeline_clean" ->
      """WITH canon AS (
        |  SELECT min(doc_id) doc_id FROM documents GROUP BY sha256(text)),
        |d1 AS (SELECT d.doc_id, d.source, d.text
        |  FROM documents d JOIN canon USING (doc_id)),
        |ws AS (
        |  SELECT doc_id, source, text,
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM d1),
        |dd AS (SELECT doc_id, w, len(w) nw FROM ws WHERE len(w) >= 16),
        |wins AS (
        |  SELECT doc_id, md5(array_to_string(list_slice(w, i, i + 15), ' ')) h
        |  FROM dd, unnest(generate_series(1, nw - 15)) t(i)),
        |pd AS (SELECT doc_id, h, count(*) c FROM wins GROUP BY 1, 2),
        |tot AS (SELECT h FROM pd GROUP BY h HAVING sum(c) >= 2),
        |dup AS (SELECT doc_id, CAST(sum(c) AS BIGINT) n_dup
        |  FROM pd JOIN tot USING (h) GROUP BY 1),
        |flagged AS (
        |  SELECT dd.doc_id FROM dd LEFT JOIN dup USING (doc_id)
        |  WHERE coalesce(n_dup, 0) * 5 >= nw - 15),
        |d2 AS (SELECT * FROM ws
        |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
        |m AS (
        |  SELECT doc_id, source, len(w) n_tokens,
        |    list_aggregate(list_transform(w, x -> length(x)), 'sum') sum_len,
        |    len([x for x in w
        |         if list_contains(['the','a','of','and','to','in','is'], x)])
        |      stop_hits,
        |    len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) sym_hits,
        |    length(regexp_replace(lower(text), '\s', '', 'g')) n_chars_nospace
        |  FROM d2 WHERE len(w) > 0),
        |k AS (
        |  SELECT source, n_tokens FROM m
        |  WHERE n_tokens >= 20 AND n_tokens <= 100000
        |    AND sum_len * 10 >= n_tokens * 30 AND sum_len * 10 <= n_tokens * 100
        |    AND stop_hits * 100 >= n_tokens
        |    AND sym_hits * 10 <= n_chars_nospace * 3)
        |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT)
        |  AS n_tokens
        |FROM k GROUP BY 1""".stripMargin,
    // Assignment CTEs identical to x_kmeans (whose gate proves the cell
    // labeling is engine-exact), then per-cell term counting and top-5.
    "x_cluster_topics" ->
      """WITH nl AS (SELECT min(c) c FROM range(1, 100000) t(c)
        |  WHERE c*c >= (SELECT count(*) FROM embeddings)),
        |emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |cent AS (SELECT vec_id cid, v cv FROM emb, nl WHERE vec_id < c),
        |asg AS (SELECT vec_id, cid AS cell FROM (
        |  SELECT e.vec_id, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, c.cv)
        |        / (sqrt(list_dot_product(e.v, e.v))
        |           * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |      c.cid DESC) rn
        |  FROM emb e CROSS JOIN cent c) WHERE rn = 1),
        |dw AS (
        |  SELECT a.cell,
        |    [w for w in string_split_regex(lower(d.text), '\s+') if w != ''] w
        |  FROM asg a JOIN documents d ON a.vec_id = d.doc_id),
        |toks AS (SELECT cell, unnest(w) term FROM dw),
        |tc AS (
        |  SELECT cell, term, count(*) n FROM toks
        |  WHERE term NOT IN ('the','a','of','and','to','in','is')
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT cell, term, n,
        |    row_number() OVER (PARTITION BY cell ORDER BY n DESC, term) rnk
        |  FROM tc)
        |SELECT cell, term, CAST(n AS BIGINT) AS n_occurrences,
        |  CAST(rnk AS BIGINT) AS rank
        |FROM rk WHERE rnk <= 5""".stripMargin,
    "x_kmeans" ->
      raw"""$ivfCommon,
        |nrm AS (SELECT cell cid, CAST(i - 1 AS INT) pos,
        |    v[i] / sqrt(list_dot_product(v, v)) comp
        |  FROM asg, unnest(generate_series(1, len(v))) t(i)),
        |upd AS (SELECT cid, pos, sum(comp) / count(*) AS m
        |  FROM nrm GROUP BY 1, 2),
        |grid AS (SELECT c.cid, CAST(i - 1 AS INT) AS pos, c.cv[i] AS old
        |  FROM cent c, unnest(generate_series(1, len(c.cv))) t(i))
        |SELECT g.cid, g.pos, round(coalesce(u.m, g.old), 6) AS cv
        |FROM grid g LEFT JOIN upd u ON u.cid = g.cid AND u.pos = g.pos""".stripMargin,
    // NOT EXISTS (not NOT IN) to match anti-join NULL semantics exactly.
    "x_dedup_bloom" ->
      """WITH f AS (SELECT doc_id, md5(text) AS fp FROM documents)
        |SELECT doc_id, fp FROM f d
        |WHERE doc_id % 3 = 0
        |  AND NOT EXISTS (SELECT 1 FROM f h
        |    WHERE h.doc_id % 3 != 0 AND h.fp = d.fp)""".stripMargin,

    // Same lateral-unnest token positions as x_pmi, one extra lateral for
    // the offset; least/greatest canonicalization is binary collation in
    // both engines.
    "x_cooccur" ->
      """WITH ws AS (
        |  SELECT [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |prs AS (
        |  SELECT least(w[i], w[i + j]) a, greatest(w[i], w[i + j]) b
        |  FROM ws,
        |    unnest(generate_series(1, 3)) s(j),
        |    unnest(generate_series(1, len(w) - j)) x(i)),
        |pc AS (SELECT a, b, count(*) n FROM prs GROUP BY 1, 2
        |  HAVING count(*) >= 5),
        |top AS (SELECT a, b, n FROM pc ORDER BY n DESC, a, b LIMIT 50)
        |SELECT a, b, CAST(n AS BIGINT) AS n_cooc,
        |  CAST(row_number() OVER (ORDER BY n DESC, a, b) AS BIGINT) AS rank
        |FROM top""".stripMargin,

    "x_pmi" ->
      """WITH ws AS (
        |  SELECT [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |toks AS (SELECT unnest(w) t FROM ws),
        |uni AS (SELECT t, count(*) uc FROM toks GROUP BY 1),
        |prs AS (
        |  SELECT concat(w[i], ' ', w[i + 1]) p
        |  FROM ws, unnest(generate_series(1, len(w) - 1)) x(i)),
        |pc AS (SELECT p, count(*) pc FROM prs GROUP BY 1 HAVING count(*) >= 5),
        |tot AS (SELECT CAST(sum(len(w)) AS BIGINT) nt,
        |  CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) np FROM ws),
        |top AS (SELECT p, pc FROM pc ORDER BY pc DESC, p LIMIT 50),
        |j AS (SELECT p, pc, string_split(p, ' ')[1] a, string_split(p, ' ')[2] b
        |  FROM top)
        |SELECT p AS pair, CAST(pc AS BIGINT) n_pair, CAST(ua.uc AS BIGINT) n_a,
        |  CAST(ub.uc AS BIGINT) n_b,
        |  round(ln((CAST(pc AS DOUBLE) / np)
        |    / ((CAST(ua.uc AS DOUBLE) / nt) * (CAST(ub.uc AS DOUBLE) / nt))), 6)
        |    pmi,
        |  CAST(row_number() OVER (ORDER BY pc DESC, p) AS BIGINT) rank
        |FROM j JOIN uni ua ON j.a = ua.t JOIN uni ub ON j.b = ub.t
        |CROSS JOIN tot""".stripMargin,
    "x_vocab" ->
      """WITH toks AS (
        |  SELECT unnest(
        |    [w for w in string_split_regex(lower(text), '\s+') if w != '']) term
        |  FROM documents),
        |c AS (SELECT term, count(*) cnt FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) total FROM c),
        |top AS (SELECT term, cnt FROM c ORDER BY cnt DESC, term LIMIT 100)
        |SELECT term, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) rank,
        |  CAST(sum(cnt) OVER (ORDER BY cnt DESC, term ROWS UNBOUNDED PRECEDING)
        |    * 1000000 // total AS BIGINT) coverage_ppm
        |FROM top CROSS JOIN tot""".stripMargin,
    "x_len_hist" ->
      """WITH h AS (
        |  SELECT CAST(len(
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''])
        |    AS BIGINT) n
        |  FROM documents),
        |tot AS (SELECT count(*) nd FROM h)
        |SELECT (n // 32) * 32 AS bucket_lo, count(*) AS n_docs,
        |  min(n) AS min_tokens, max(n) AS max_tokens,
        |  CAST(count(*) * 1000000 // max(nd) AS BIGINT) AS frac_ppm
        |FROM h CROSS JOIN tot
        |GROUP BY 1""".stripMargin,
    "x_dedup_substr" ->
      """WITH ws AS (
        |  SELECT doc_id,
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |d AS (SELECT doc_id, w, len(w) nw FROM ws WHERE len(w) >= 16),
        |wins AS (
        |  SELECT doc_id, md5(array_to_string(list_slice(w, i, i + 15), ' ')) h
        |  FROM d, unnest(generate_series(1, nw - 15)) t(i)),
        |pd AS (SELECT doc_id, h, count(*) c FROM wins GROUP BY 1, 2),
        |tot AS (SELECT h FROM pd GROUP BY h HAVING sum(c) >= 2),
        |dup AS (SELECT doc_id, CAST(sum(c) AS BIGINT) n_dup
        |  FROM pd JOIN tot USING (h) GROUP BY 1)
        |SELECT d.doc_id, CAST(nw - 15 AS BIGINT) AS n_windows,
        |  coalesce(n_dup, 0) AS n_dup_windows,
        |  round(coalesce(n_dup, 0) / CAST(nw - 15 AS DOUBLE), 6) AS dup_frac,
        |  CAST(coalesce(n_dup, 0) * 5 >= nw - 15 AS INT) AS flagged
        |FROM d LEFT JOIN dup USING (doc_id)""".stripMargin,
    // Brute-force maximal-span replay: for EVERY position the longest
    // m-gram (m <= the engine's cap) occurring >= 2 times anywhere
    // in the corpus — dup_len(pos) = max duplicated m — then the same
    // running-max interval union the engine computes. Exhaustive over
    // positions x lengths, so it IS the definitionally-exact answer the
    // suffix array must reproduce. ONE select body serves both caps so
    // the two strategy branches are gated against literally the same
    // semantics.
    // Full canonicalization replay: the identical URL synthesis (VARCHAR
    // casts), then every rule — scheme/authority lower, default-port
    // strip, fragment drop, tracking-param filter, param sort,
    // trailing-slash strip — re-derived with DuckDB string/list
    // functions before the same canonical-key rollup.
    "x_dedup_url" ->
      (urlCanonCtes +
        """
        |SELECT canon_url, min(doc_id) AS cluster_rep,
        |  count(*) AS n_members,
        |  count(DISTINCT url) AS n_raw_forms
        |FROM c2 GROUP BY 1""".stripMargin),
    // Boilerplate replay: the page synthesis (nav bar, 1-3 word-slice
    // paragraphs with the j=1 inline link, short line, footer) AND the
    // full per-line screen (anchor-chars extraction, tag strip + space
    // collapse, word floor, exact-ppm link density, ordered md5
    // reassembly) re-derived in DuckDB.
    "x_boilerplate" ->
      raw"""WITH ws AS (
        |  SELECT doc_id,
        |    [x for x in string_split_regex(text, '\s+') if x != ''] w
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    '<a href="/">Home</a> | <a href="/about">About us</a>' ||
        |    ' | <a href="/c">Contact</a>' || chr(10) ||
        |    array_to_string(
        |      -- coalesce: an overrun slice is the EMPTY list, whose
        |      -- array_to_string is NULL in DuckDB, and the outer join
        |      -- would silently skip the (empty) line Spark keeps
        |      [coalesce(array_to_string(w[(1 + (j - 1) * 8):(j * 8)],
        |         ' '), '') ||
        |       (CASE WHEN j = 1
        |             THEN ' <a href="/t">details</a>' ELSE '' END)
        |       for j in range(1, 2 + CAST(doc_id % 3 AS INT))],
        |      chr(10)) ||
        |    chr(10) || 'Thanks!' || chr(10) ||
        |    '(c) 2024 <a href="/privacy">Privacy</a>' AS page
        |  FROM ws),
        |ls AS (SELECT doc_id, string_split(page, chr(10)) lns FROM h),
        |line AS (
        |  SELECT doc_id, i AS idx,
        |    coalesce(list_aggregate(list_transform(
        |      regexp_extract_all(lns[i], '<[aA][^>]*>([^<]*)</[aA]>', 1),
        |      x -> len(x)), 'sum'), 0) AS link_chars,
        |    trim(regexp_replace(regexp_replace(lns[i],
        |      '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS clean
        |  FROM ls, unnest(generate_series(1, len(lns))) t(i)),
        |m AS (
        |  SELECT doc_id, idx, clean, len(clean) AS n_chars,
        |    (CASE WHEN clean = '' THEN 0
        |          ELSE len(string_split(clean, ' ')) END) >= 8
        |      AND link_chars * 1000000 <= len(clean) * 350000 AS content
        |  FROM line)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(coalesce(sum(CASE WHEN content THEN 1 END), 0) AS BIGINT)
        |    AS n_content_lines,
        |  CAST(coalesce(sum(CASE WHEN content THEN n_chars END), 0)
        |    AS BIGINT) AS content_chars,
        |  md5(coalesce(array_to_string(
        |    list(clean ORDER BY idx) FILTER (WHERE content), chr(10)),
        |    '')) AS content_md5
        |FROM m GROUP BY doc_id""".stripMargin,

    // Robots replay: the parser's surviving rule rows predicted
    // arithmetically from the planted group structure — exact GraftBot
    // groups (mod 3) shadow the * group; the * group's two rules
    // survive everywhere else; the empty "Disallow:" and the inline
    // comment leave no trace by construction.
    "x_robots" ->
      """WITH f AS (
        |  SELECT doc_id, 'h' || CAST(doc_id AS VARCHAR) AS host,
        |    doc_id % 3 = 0 AS has_exact, doc_id % 2 = 0 AS has_allow,
        |    CAST(doc_id % 10 AS VARCHAR) AS k
        |  FROM documents)
        |SELECT host, 'disallow' AS rule, '/private' AS path
        |  FROM f WHERE NOT has_exact
        |UNION ALL
        |SELECT host, 'allow', '/private/ok' FROM f WHERE NOT has_exact
        |UNION ALL
        |SELECT host, 'disallow', '/trap-' || k FROM f WHERE has_exact
        |UNION ALL
        |SELECT host, 'allow', '/trap-' || k || '/ok'
        |  FROM f WHERE has_exact AND has_allow""".stripMargin,
    // Blocklist replay over the SAME canonicalization chain: the rule
    // table is rendered as VALUES from the shared UrlRules constant (a
    // rule edit cannot desync the gate), prefix semantics via
    // starts_with on the canonical host/path, per-URL any-match before
    // the host rollup.
    "x_url_filter" ->
      (urlCanonCtes + raw""",
        |hp AS (
        |  SELECT doc_id,
        |    regexp_extract(canon_url, '^[^:/?#]+://([^/?#]*)', 1) AS host,
        |    regexp_extract(canon_url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)
        |      AS path
        |  FROM c2),
        |rules(r_host, r_prefix) AS (VALUES """.stripMargin +
        UrlRules.map { case (h, p) => s"('$h', '$p')" }.mkString(", ") +
        raw"""),
        |m AS (
        |  SELECT hp.doc_id, hp.host,
        |    max(CASE WHEN r.r_host IS NOT NULL THEN 1 ELSE 0 END) AS b
        |  FROM hp LEFT JOIN rules r
        |    ON hp.host = r.r_host AND starts_with(hp.path, r.r_prefix)
        |  GROUP BY 1, 2)
        |SELECT host, count(*) AS n_urls,
        |  CAST(sum(b) AS BIGINT) AS n_blocked,
        |  CAST(count(*) - sum(b) AS BIGINT) AS n_kept
        |FROM m GROUP BY host""".stripMargin),
    // Anchor-index replay: the planted anchor list is regenerated
    // arithmetically (variant v in (0,1) collapses to the canonical
    // base, v=2 keeps its sorted query; every 4th doc's relative href
    // is the NULL-canonical group with token 'here'), then aggregated
    // with the same count-majority / lexicographically-last-term
    // argmax. The top-term join is null-SAFE so the NULL group keeps
    // its modal term, mirroring the Spark side's <=> join.
    "x_anchor_text" ->
      """WITH l AS (
        |  SELECT doc_id AS src,
        |    CAST((doc_id * 7 + j * 11) % 40 AS VARCHAR) AS t,
        |    CAST((doc_id + j) % 6 AS VARCHAR) AS p,
        |    (doc_id + j) % 3 AS v
        |  FROM documents,
        |    unnest(generate_series(1, 1 + CAST(doc_id % 3 AS INT))) s(j)),
        |links AS (
        |  SELECT src,
        |    'https://example' || t || '.com/q' || p ||
        |      CASE WHEN v = 2 THEN '?a=1&b=2' ELSE '' END AS dst,
        |    ['link', t, 'page' || p] AS toks
        |  FROM l
        |  UNION ALL
        |  SELECT doc_id, NULL, ['here'] FROM documents
        |  WHERE doc_id % 4 = 0),
        |byd AS (
        |  SELECT dst, count(*) AS n_links,
        |    count(DISTINCT src) AS n_srcs,
        |    CAST(sum(len(toks)) AS BIGINT) AS n_anchor_toks
        |  FROM links GROUP BY 1),
        |tt AS (
        |  SELECT dst, term, count(*) AS n
        |  FROM (SELECT dst, unnest(toks) AS term FROM links)
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT dst, term AS top_term FROM (
        |    SELECT dst, term, row_number() OVER (
        |      PARTITION BY dst ORDER BY n DESC, term DESC) AS rn
        |    FROM tt) WHERE rn = 1)
        |SELECT byd.dst AS dst_url, n_links, n_srcs, n_anchor_toks,
        |  coalesce(top_term, '') AS top_term
        |FROM byd LEFT JOIN top
        |  ON top.dst IS NOT DISTINCT FROM byd.dst""".stripMargin,
    // Sitemap replay: the planted entry list regenerated arithmetically
    // (canonical loc = base page, the utm variant collapses; verbatim
    // lastmod/priority arms; the loc-less block is the visible ''-loc
    // row).
    "x_sitemap" ->
      """WITH e AS (
        |  SELECT doc_id, j,
        |    CAST((doc_id * 3 + j * 7) % 50 AS VARCHAR) AS t
        |  FROM documents,
        |    unnest(generate_series(1, 1 + CAST(doc_id % 3 AS INT))) s(j))
        |SELECT 's' || CAST(doc_id AS VARCHAR) AS host,
        |  'https://s' || CAST(doc_id AS VARCHAR) || '.example.com/page-'
        |    || t AS loc,
        |  CASE WHEN (doc_id + j) % 3 = 0
        |       THEN '2024-0' || CAST(j AS VARCHAR) || '-01'
        |       ELSE '' END AS lastmod,
        |  CASE WHEN (doc_id + j) % 5 = 0 THEN '0.8' ELSE '' END
        |    AS priority
        |FROM e
        |UNION ALL
        |SELECT 's' || CAST(doc_id AS VARCHAR), '', '2024-01-01', ''
        |FROM documents WHERE doc_id % 11 = 0""".stripMargin,
    // Redirect replay: the same functional graph (block chains, max-id
    // terminal, the backward 2-cycle arm), walked by a hop-capped
    // recursive CTE; a source whose walk reaches a terminal row within
    // 32 hops resolves with that exact hop count, anything else is the
    // visible unresolved row.
    "x_redirect_resolve" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'https://r' || CAST(doc_id AS VARCHAR) ||
        |      '.example.com/' AS u,
        |    CASE WHEN doc_id % 5 = 4
        |           OR doc_id = (SELECT max(doc_id) FROM documents)
        |         THEN NULL
        |         WHEN doc_id % 101 = 7
        |         THEN 'https://r' || CAST(doc_id - 1 AS VARCHAR) ||
        |           '.example.com/'
        |         ELSE 'https://r' || CAST(doc_id + 1 AS VARCHAR) ||
        |           '.example.com/' END AS nxt
        |  FROM documents),
        |walk AS (
        |  SELECT u AS src, u AS cur, nxt, 0 AS hops FROM e
        |  UNION ALL
        |  SELECT w.src, e2.u, e2.nxt, w.hops + 1
        |  FROM walk w JOIN e e2 ON e2.u = w.nxt
        |  WHERE w.nxt IS NOT NULL AND w.hops < 32),
        |fin AS (SELECT src, cur, hops FROM walk WHERE nxt IS NULL)
        |SELECT e.u AS url,
        |  coalesce(fin.cur, '') AS final_url,
        |  CAST(coalesce(fin.hops, 0) AS BIGINT) AS hops,
        |  CAST(fin.src IS NOT NULL AS INT) AS resolved
        |FROM e LEFT JOIN fin ON fin.src = e.u""".stripMargin,
    "x_dedup_suffix" -> (sufCommonFor(SufCap) + sufSelect),
    // cap=256 > DirectSortCap: the identical oracle semantics replayed
    // at the deep cap, gating the prefix-doubling branch the default
    // registration never executes.
    "x_dedup_suffix_deep" -> (sufCommonFor(SufCapDeep) + sufSelect),
    // Onion replay: the same mk interval union, joined back to the
    // token values; kept = NOT covered (NULL running end = kept), md5
    // over the order-preserved retained text, '' for a fully-cut doc.
    "x_dedup_onion" ->
      (sufCommonFor(SufCap) + """,
        |docw AS (SELECT doc_id, i p, w[i] tok
        |  FROM d, unnest(generate_series(1, n)) t(i))
        |SELECT mk.doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(CASE WHEN NOT coalesce(rm > mk.p, false)
        |    THEN 1 END), 0) AS BIGINT) AS kept_tokens,
        |  CAST(n - coalesce(sum(CASE WHEN NOT coalesce(rm > mk.p, false)
        |    THEN 1 END), 0) AS BIGINT) AS removed_tokens,
        |  md5(coalesce(string_agg(tok, ' ' ORDER BY mk.p)
        |    FILTER (WHERE NOT coalesce(rm > mk.p, false)), ''))
        |    AS kept_md5
        |FROM mk JOIN docw ON mk.doc_id = docw.doc_id AND mk.p = docw.p
        |GROUP BY mk.doc_id, n""".stripMargin),
    // Unrolled hard-EM replay: the final pruned piece table with final
    // counts, add-one micro-log weights and the (count desc, piece)
    // rank — every Viterbi decision re-derived in exact integers.
    "x_unigram_train" ->
      (uniCommon + "\n" +
        """SELECT piece, CAST(c AS BIGINT) AS n_uses,
          |  CAST(round(ln((c + 1) / (SELECT d FROM den)) * 1000000, 0)
          |    AS BIGINT) AS wt_micro,
          |  CAST(row_number() OVER (ORDER BY c DESC, piece) AS BIGINT)
          |    AS rank
          |FROM pr""".stripMargin),
    // Same training replay, then ONE more unrolled DP under the final
    // pruned weights and the positional per-doc reassembly.
    "x_unigram_apply" ->
      (uniCommon + ",\n" +
        """wfin AS MATERIALIZED (SELECT piece,
          |  CAST(round(ln((c + 1) / (SELECT d FROM den)) * 1000000, 0)
          |    AS BIGINT) wt
          |  FROM pr),
          |""".stripMargin + uniDp("fa", "wfin") + ",\n" +
        """docw AS MATERIALIZED (SELECT doc_id, i p, w[i] word
          |  FROM ws, unnest(generate_series(1, len(w))) t(i))
          |SELECT doc_id,
          |  CAST(sum(len(g) - len(replace(g, '<', ''))) AS BIGINT)
          |    AS n_pieces,
          |  md5(string_agg(g, '' ORDER BY p)) AS seg_md5
          |FROM docw JOIN segfa USING (word)
          |GROUP BY doc_id""".stripMargin),
    "x_bpe_train" ->
      (bpeOracleCtes(BpeRounds) + "\n" +
        (1 to BpeRounds).map { i =>
          val prefix = if (i == 1) s"SELECT CAST($i AS BIGINT) round, "
                       else s"UNION ALL SELECT $i, "
          s"${prefix}lhs, rhs, cnt pair_count FROM m$i"
        }.mkString("SELECT * FROM (\n", "\n", ")")),
    "x_bpe_apply" ->
      (bpeOracleCtes(BpeRounds) + ",\n" +
        """a0 AS (SELECT doc_id,
          |  regexp_replace(lower(trim(text)), '(\S)', '<\1>', 'g') seg
          |  FROM documents)""".stripMargin + ",\n" +
        (1 to BpeRounds).map { i =>
          s"""a$i AS (SELECT doc_id, replace(seg,
             |  (SELECT '<' || lhs || '><' || rhs || '>' FROM m$i),
             |  (SELECT '<' || lhs || rhs || '>' FROM m$i)) seg
             |  FROM a${i - 1})""".stripMargin
        }.mkString(",\n") + "\n" +
        s"""SELECT doc_id,
           |  CAST(length(seg) - length(replace(seg, '<', '')) AS BIGINT)
           |    AS n_bpe_tokens,
           |  md5(seg) AS seg_md5
           |FROM a$BpeRounds""".stripMargin),
    // Fertility replay: the same 6-round merge CTEs, the same per-word
    // wrap + chained replace — but over the DISTINCT (source, word)
    // table, weighted back by occurrence counts, with the exact-ppm
    // per-source rollup.
    "x_tok_fertility" ->
      (bpeOracleCtes(BpeRounds) + ",\n" +
        raw"""fw0 AS (
          |  SELECT source, word, count(*) wf FROM (
          |    SELECT source, unnest(
          |      [w for w in string_split_regex(trim(lower(text)), '\s+')
          |       if w != '']) word
          |    FROM documents)
          |  GROUP BY 1, 2),
          |fs0 AS (SELECT source, wf,
          |  regexp_replace(word, '(\S)', '<\1>', 'g') seg FROM fw0)""".stripMargin + ",\n" +
        (1 to BpeRounds).map { i =>
          s"""fs$i AS (SELECT source, wf, replace(seg,
             |  (SELECT '<' || lhs || '><' || rhs || '>' FROM m$i),
             |  (SELECT '<' || lhs || rhs || '>' FROM m$i)) seg
             |  FROM fs${i - 1})""".stripMargin
        }.mkString(",\n") + "\n" +
        s"""SELECT source,
           |  CAST(sum(wf) AS BIGINT) AS n_words,
           |  CAST(sum(wf * pieces) AS BIGINT) AS n_pieces,
           |  CAST(sum(wf * pieces) * 1000000 // sum(wf) AS BIGINT)
           |    AS fertility_ppm,
           |  CAST(coalesce(sum(CASE WHEN pieces = 1 THEN wf END), 0)
           |    AS BIGINT) AS n_unsplit
           |FROM (SELECT source, wf,
           |    length(seg) - length(replace(seg, '<', '')) pieces
           |  FROM fs$BpeRounds)
           |GROUP BY source""".stripMargin),
    "x_bpe_stats" ->
      """WITH toks AS (
        |  SELECT unnest(
        |    [w for w in string_split_regex(lower(text), '\s+') if w != '']) term
        |  FROM documents),
        |wf AS (SELECT term, count(*) wf FROM toks GROUP BY 1),
        |pairs AS (
        |  SELECT substr(term, i, 2) pair, wf
        |  FROM wf, unnest(generate_series(1, length(term) - 1)) t(i)
        |  WHERE length(term) >= 2),
        |agg AS (SELECT pair, CAST(sum(wf) AS BIGINT) n_occurrences
        |  FROM pairs GROUP BY 1),
        |top AS (SELECT pair, n_occurrences FROM agg
        |  ORDER BY n_occurrences DESC, pair LIMIT 50)
        |SELECT pair, n_occurrences,
        |  CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair) AS BIGINT)
        |    AS rank
        |FROM top""".stripMargin,
    "x_rank_fusion" ->
      """WITH ws AS (
        |  SELECT doc_id,
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |d AS (SELECT doc_id, w, len(w) dl FROM ws WHERE len(w) > 0),
        |st AS (SELECT count(*) n, CAST(sum(dl) AS BIGINT) sdl FROM d),
        |tf AS (SELECT doc_id, dl, t.term, count(*) tf
        |  FROM d, unnest(w) t(term)
        |  WHERE t.term IN ('spark', 'table', 'merge') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id,
        |    sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1)
        |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n)))) s
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN st GROUP BY doc_id),
        |lex AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) rank
        |  FROM sc QUALIFY rank <= 20),
        |emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |pv AS (SELECT v pv FROM emb WHERE vec_id = 0),
        |dcs AS (SELECT vec_id,
        |    round(list_dot_product(v, pv)
        |      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(pv, pv))), 6)
        |      cs
        |  FROM emb, pv WHERE vec_id <> 0),
        |dense AS (SELECT vec_id doc_id,
        |    row_number() OVER (ORDER BY cs DESC, vec_id) rank
        |  FROM dcs QUALIFY rank <= 20),
        |contrib AS (
        |  SELECT doc_id, 'lex' src, rank FROM lex
        |  UNION ALL SELECT doc_id, 'dense', rank FROM dense),
        |fused AS (
        |  SELECT doc_id, CAST(sum(1000000000000 // (60 + rank)) AS BIGINT)
        |      rrf_score,
        |    CAST(coalesce(max(CASE WHEN src = 'lex' THEN rank END), 0) AS BIGINT)
        |      lex_rank,
        |    CAST(coalesce(max(CASE WHEN src = 'dense' THEN rank END), 0)
        |      AS BIGINT) dense_rank
        |  FROM contrib GROUP BY doc_id),
        |top AS (SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10)
        |SELECT doc_id, rrf_score, lex_rank, dense_rank,
        |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT)
        |    fused_rank
        |FROM top""".stripMargin,
    "x_knn_graph" ->
      raw"""$ivfCommon,
        |pr AS (SELECT x.vec_id src_id, y.vec_id nbr_id,
        |    round(list_dot_product(x.v, y.v)
        |      / (sqrt(list_dot_product(x.v, x.v))
        |         * sqrt(list_dot_product(y.v, y.v))), 6) cos_sim
        |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
        |rk AS (SELECT src_id, nbr_id, cos_sim,
        |    row_number() OVER (PARTITION BY src_id ORDER BY cos_sim DESC, nbr_id)
        |      rnk FROM pr)
        |SELECT src_id, nbr_id, cos_sim, CAST(rnk AS BIGINT) AS rank
        |FROM rk WHERE rnk <= 5""".stripMargin,
    // x_knn_graph's assignment replay with the label riding through the
    // argmax, then within-cell pairs restricted to label inequality.
    "x_hard_neg" ->
      """WITH nl AS (SELECT min(c) c FROM range(1, 100000) t(c)
        |  WHERE c*c >= (SELECT count(*) FROM embeddings)),
        |emb AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |cent AS (SELECT vec_id cid, v cv FROM emb, nl WHERE vec_id < c),
        |asg AS (SELECT vec_id, label, v, cid AS cell FROM (
        |  SELECT e.vec_id, e.label, e.v, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, c.cv)
        |        / (sqrt(list_dot_product(e.v, e.v))
        |           * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |      c.cid DESC) rn
        |  FROM emb e CROSS JOIN cent c) WHERE rn = 1),
        |pr AS (SELECT x.vec_id anchor_id, x.label anchor_label,
        |    y.vec_id neg_id, y.label neg_label,
        |    round(list_dot_product(x.v, y.v)
        |      / (sqrt(list_dot_product(x.v, x.v))
        |         * sqrt(list_dot_product(y.v, y.v))), 6) cos_sim
        |  FROM asg x JOIN asg y
        |    ON x.cell = y.cell AND x.label <> y.label),
        |rk AS (SELECT anchor_id, anchor_label, neg_id, neg_label, cos_sim,
        |    row_number() OVER (PARTITION BY anchor_id
        |      ORDER BY cos_sim DESC, neg_id) rnk FROM pr)
        |SELECT anchor_id, anchor_label, neg_id, neg_label, cos_sim,
        |  CAST(rnk AS BIGINT) AS rank
        |FROM rk WHERE rnk <= 3""".stripMargin,
    "x_sample_diverse" ->
      raw"""$ivfCommon,
        |scored AS (SELECT a.cell, a.vec_id,
        |    round(list_dot_product(a.v, c.cv)
        |      / (sqrt(list_dot_product(a.v, a.v))
        |         * sqrt(list_dot_product(c.cv, c.cv))), 6) cos_centroid
        |  FROM asg a JOIN cent c ON a.cell = c.cid),
        |rk AS (SELECT cell, vec_id, cos_centroid,
        |    row_number() OVER (PARTITION BY cell
        |      ORDER BY cos_centroid DESC, vec_id) rnk
        |  FROM scored)
        |SELECT cell, vec_id, cos_centroid, CAST(rnk AS BIGINT) AS rank
        |FROM rk WHERE rnk <= 2""".stripMargin,
    "x_knn_graph_probe" ->
      """WITH nl AS (SELECT min(c) c FROM range(1, 100000) t(c)
        |  WHERE c*c >= (SELECT count(*) FROM embeddings)),
        |emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |cent AS (SELECT vec_id cid, v cv FROM emb, nl WHERE vec_id < c),
        |rkc AS (
        |  SELECT e.vec_id, e.v, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, c.cv)
        |        / (sqrt(list_dot_product(e.v, e.v))
        |           * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |      c.cid DESC) rn
        |  FROM emb e CROSS JOIN cent c),
        |asg AS (SELECT vec_id, v, cid AS cell FROM rkc WHERE rn = 1),
        |srch AS (SELECT vec_id, v, cid AS cell FROM rkc WHERE rn <= 2),
        |pr AS (SELECT x.vec_id src_id, y.vec_id nbr_id,
        |    round(list_dot_product(x.v, y.v)
        |      / (sqrt(list_dot_product(x.v, x.v))
        |         * sqrt(list_dot_product(y.v, y.v))), 6) cos_sim
        |  FROM srch x JOIN asg y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
        |rk AS (SELECT src_id, nbr_id, cos_sim,
        |    row_number() OVER (PARTITION BY src_id ORDER BY cos_sim DESC, nbr_id)
        |      rnk FROM pr)
        |SELECT src_id, nbr_id, cos_sim, CAST(rnk AS BIGINT) AS rank
        |FROM rk WHERE rnk <= 5""".stripMargin,
    "x_dedup_para" ->
      """WITH ws AS (
        |  SELECT doc_id, source,
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |pa0 AS (
        |  SELECT doc_id,
        |    [array_to_string(list_slice(w, i*16+1, i*16+16), ' ')
        |     for i in range(0, ((len(w)-1)//16)+1)]
        |    || ['subscribe for updates all rights reserved',
        |        concat('from ', source, ' all rights reserved')] ps
        |  FROM ws WHERE len(w) > 0),
        |pa AS (
        |  SELECT doc_id, unnest(ps) para, unnest(range(0, len(ps))) para_idx
        |  FROM pa0),
        |ph AS (SELECT doc_id, para_idx, para, md5(para) ph FROM pa),
        |bo AS (SELECT ph FROM ph GROUP BY ph HAVING count(DISTINCT doc_id) >= 3),
        |j AS (
        |  SELECT p.doc_id, p.para_idx, p.para, b.ph IS NOT NULL AS boiler
        |  FROM ph p LEFT JOIN bo b ON p.ph = b.ph)
        |SELECT doc_id, count(*) AS n_paras,
        |  CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  CAST(coalesce(sum(CASE WHEN NOT boiler THEN
        |    len([x for x in string_split_regex(para, '\s+') if x != '']) END), 0)
        |    AS BIGINT) AS n_tokens_kept,
        |  md5(coalesce(string_agg(para, ' ' ORDER BY para_idx)
        |    FILTER (WHERE NOT boiler), '')) AS kept_md5
        |FROM j GROUP BY doc_id""".stripMargin,
    "x_mix_domain" ->
      """WITH ws AS (
        |  SELECT doc_id, source,
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, source AS domain, len(w) AS n_tokens,
        |    CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
        |         THEN 1000 ELSE 500 END AS budget
        |  FROM ws),
        |rt AS (
        |  SELECT domain,
        |    CAST(least(1000000, max(budget) * 1000000 // sum(n_tokens))
        |      AS BIGINT) AS rate_ppm
        |  FROM tok GROUP BY domain)
        |SELECT doc_id, domain, CAST(n_tokens AS BIGINT) AS n_tokens, rate_ppm,
        |  round(1000000.0 / rate_ppm, 6) AS weight
        |FROM tok JOIN rt USING (domain)
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      * 1000000 < rate_ppm * (CAST(1 AS BIGINT) << 32)""".stripMargin,
    "x_bm25" ->
      """WITH ws AS (
        |  SELECT doc_id, [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |d AS (SELECT doc_id, w, len(w) dl FROM ws WHERE len(w) > 0),
        |st AS (SELECT count(*) n, CAST(sum(dl) AS BIGINT) sdl FROM d),
        |tf AS (
        |  SELECT doc_id, dl, t.term, count(*) tf
        |  FROM d, unnest(w) t(term)
        |  WHERE t.term IN ('spark', 'table', 'merge') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT doc_id,
        |    sum(ln(1 + (n - df + 0.5) / (df + 0.5))
        |      * tf * (1.2 + 1)
        |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n)))) s
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN st GROUP BY doc_id),
        |rk AS (
        |  SELECT doc_id, round(s, 6) score,
        |    row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) rnk
        |  FROM sc)
        |SELECT doc_id, score, CAST(rnk AS BIGINT) AS rank
        |FROM rk WHERE rnk <= 10""".stripMargin,
    "x_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, sha256(text) fp,
        |    CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 64 + 16 nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, fp,
        |    unnest(range(0, least(nf, 57), 8)) frame_idx
        |  FROM m WHERE nf > 0)
        |SELECT doc_id, CAST(frame_idx // 8 AS BIGINT) AS sample_ord,
        |  CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(frame_idx * 40 AS BIGINT) AS ts_ms,
        |  md5(concat(fp, ':', CAST(frame_idx AS VARCHAR))) AS frame_md5
        |FROM fr""".stripMargin,
    "x_dedup_incr" ->
      """WITH ws AS (
        |  SELECT doc_id, [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat(w[i], ' ', w[i+1], ' ', w[i+2]) for i in range(1, len(w)-1)]) shingles
        |  FROM ws WHERE len(w) >= 3),
        |hs AS (
        |  SELECT doc_id, list_transform(shingles, s -> md5(s)) h FROM sh),
        |sig AS (
        |  SELECT doc_id,
        |    [list_aggregate(list_transform(h, x ->
        |       (CAST(('0x' || substr(x, 1, 12)) AS BIGINT) * (2*p+1)) % 4398046511104), 'min')
        |     for p in range(0, 16)] sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, b,
        |    md5(concat(CAST(sig[2*b+1] AS VARCHAR), '|', CAST(sig[2*b+2] AS VARCHAR))) bkey
        |  FROM sig CROSS JOIN range(0, 8) t(b)),
        |exfp AS (
        |  SELECT DISTINCT sha256(text) fp FROM documents WHERE doc_id % 5 <> 0),
        |dex AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id % 5 = 0 AND sha256(text) IN (SELECT fp FROM exfp)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey
        |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
        |dnear AS (
        |  SELECT DISTINCT da AS doc_id FROM cand
        |  JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
        |  WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(x.shingles, y.shingles))) >= 0.8)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN d.doc_id IN (SELECT doc_id FROM dex)
        |       THEN 1 ELSE 0 END AS BIGINT) AS dup_exact,
        |  CAST(CASE WHEN d.doc_id IN (SELECT doc_id FROM dnear)
        |       THEN 1 ELSE 0 END AS BIGINT) AS dup_near,
        |  CAST(CASE WHEN d.doc_id IN (SELECT doc_id FROM dex)
        |         OR d.doc_id IN (SELECT doc_id FROM dnear)
        |       THEN 0 ELSE 1 END AS BIGINT) AS keep
        |FROM documents d WHERE d.doc_id % 5 = 0""".stripMargin,
    // The x_perplexity pipeline joined to lang, quartile boundaries via
    // quantile_cont at binary-exact 0.25/0.75 (see GraftOps.ccnetBuckets
    // for why quartiles and not the paper's tertiles).
    "x_ccnet" ->
      """WITH ws AS (
        |  SELECT doc_id, [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |d AS (SELECT doc_id, w FROM ws WHERE len(w) > 0),
        |tf AS (
        |  SELECT doc_id, t.term, count(*) tf
        |  FROM d, unnest(w) t(term) GROUP BY 1, 2),
        |tc AS (SELECT term, CAST(sum(tf) AS BIGINT) c FROM tf GROUP BY 1),
        |st AS (SELECT CAST(sum(c) AS BIGINT) total, count(*) vocab FROM tc),
        |nll AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) n_tokens,
        |    sum(-ln((c + 1.0) / (total + vocab)) * tf) nll
        |  FROM tf JOIN tc USING (term) CROSS JOIN st GROUP BY doc_id),
        |p AS (SELECT doc_id, n_tokens,
        |  round(exp(nll / n_tokens), 6) AS ppl FROM nll),
        |j AS (SELECT p.doc_id, dd.lang, p.n_tokens, p.ppl
        |  FROM p JOIN documents dd USING (doc_id)),
        |q AS (SELECT lang,
        |    quantile_cont(ppl, 0.25) AS q1, quantile_cont(ppl, 0.75) AS q2
        |  FROM j GROUP BY lang)
        |SELECT doc_id, j.lang, n_tokens, ppl,
        |  CASE WHEN ppl <= q1 THEN 'head'
        |       WHEN ppl <= q2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM j JOIN q USING (lang)""".stripMargin,
    "x_perplexity" ->
      """WITH ws AS (
        |  SELECT doc_id, [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |d AS (SELECT doc_id, w FROM ws WHERE len(w) > 0),
        |tf AS (
        |  SELECT doc_id, t.term, count(*) tf
        |  FROM d, unnest(w) t(term) GROUP BY 1, 2),
        |tc AS (SELECT term, CAST(sum(tf) AS BIGINT) c FROM tf GROUP BY 1),
        |st AS (SELECT CAST(sum(c) AS BIGINT) total, count(*) vocab FROM tc),
        |nll AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) n_tokens,
        |    sum(-ln((c + 1.0) / (total + vocab)) * tf) nll
        |  FROM tf JOIN tc USING (term) CROSS JOIN st GROUP BY doc_id)
        |SELECT doc_id, n_tokens, round(nll / n_tokens, 6) AS avg_nll,
        |  round(exp(nll / n_tokens), 6) AS ppl
        |FROM nll""".stripMargin,
    "x_dedup_embed_cluster" ->
      """WITH RECURSIVE np AS (
        |  SELECT coalesce(min(p), 30) p FROM range(2, 31) t(p)
        |  WHERE (CAST(1 AS BIGINT) << p) * 64 >= (SELECT count(*) FROM embeddings)),
        |planes AS (
        |  SELECT j,
        |    [CASE WHEN CAST(('0x' || substr(md5(concat(CAST(j AS VARCHAR), ',', CAST(d AS VARCHAR))), 1, 1)) AS INT) % 2 = 0
        |          THEN 1.0 ELSE -1.0 END for d in range(0, 64)] h
        |  FROM range(0, 31) t(j), np WHERE j < p),
        |emb AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |buck AS (
        |  SELECT vec_id, v,
        |    string_agg(CASE WHEN list_dot_product(v, h) >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) bucket
        |  FROM emb CROSS JOIN planes GROUP BY vec_id, v),
        |pairs AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
        |edges AS (
        |  SELECT va s, vb d2 FROM pairs UNION SELECT vb, va FROM pairs),
        |nodes AS (SELECT DISTINCT s AS doc FROM edges),
        |reach(doc, lab) AS (
        |  SELECT doc, doc FROM nodes
        |  UNION
        |  SELECT e.s, r.lab FROM reach r JOIN edges e ON e.d2 = r.doc),
        |lbl AS (
        |  SELECT doc AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY doc)
        |SELECT l.doc_id, l.cluster_id,
        |  CAST(count(*) OVER (PARTITION BY l.cluster_id) AS BIGINT) AS cluster_size,
        |  CAST(l.doc_id = l.cluster_id AS INT) AS is_canonical
        |FROM lbl l""".stripMargin,
    "q_cdc_merge" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) rn,
        |    count(*) OVER (PARTITION BY user_id) nc
        |  FROM events)
        |SELECT user_id, CAST(nc AS BIGINT) AS n_changes, ts AS last_ts,
        |  event_type AS last_type, round(value, 6) AS last_value
        |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "x_shuffle_epochs" ->
      """SELECT CAST(e AS BIGINT) AS epoch, doc_id,
        |  ((doc_id + e * 1000003) * 2654435761) % 4294967296 AS ord
        |FROM documents CROSS JOIN range(0, 2) t(e)
        |ORDER BY epoch, ord, doc_id""".stripMargin,
    "x_curriculum" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    [w for w in string_split_regex(lower(text), '\s+') if w != ''] w
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, len(w) n_tokens,
        |    list_aggregate(list_transform(w, x -> length(x)), 'sum') sum_len,
        |    len([x for x in w if list_contains(['the','a','of','and','to','in','is'], x)]) stop_hits
        |  FROM base WHERE len(w) > 0),
        |sy AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) sym_hits,
        |    length(regexp_replace(lower(text), '\s', '', 'g')) n_chars_nospace
        |  FROM documents),
        |g AS (
        |  SELECT m.doc_id,
        |    CAST(n_tokens >= 20 AND n_tokens <= 100000 AS INT)
        |      + CAST(sum_len * 10 >= n_tokens * 30 AND sum_len * 10 <= n_tokens * 100 AS INT)
        |      + CAST(stop_hits * 100 >= n_tokens AS INT)
        |      + CAST(sym_hits * 10 <= n_chars_nospace * 3 AS INT) AS n_pass
        |  FROM m JOIN sy ON m.doc_id = sy.doc_id)
        |SELECT doc_id, CAST(n_pass AS DOUBLE) / 4 AS quality_score,
        |  (doc_id * 2654435761) % 4294967296 AS ord
        |FROM g ORDER BY quality_score DESC, ord, doc_id""".stripMargin,
    // Budget-allocation replay: the identical per-source token totals,
    // the weight formula re-derived arithmetically from the srcK label,
    // and the same min(target, avail·maxEpochs) grant in integer ppm.
    "x_mix_budget" ->
      (raw"""WITH a AS (
        |  SELECT source, CAST(sum(len([w for w in
        |    string_split_regex(trim(lower(text)), '\s+') if w != '']))
        |    AS BIGINT) avail
        |  FROM documents GROUP BY 1),
        |t AS (
        |  SELECT source, avail,
        |    (CAST(substr(source, 4) AS INT) + 1) * 1000000 // 210 wppm
        |  FROM a
        |  UNION ALL
        |  SELECT 'src_missing', CAST(0 AS BIGINT), CAST(50000 AS BIGINT)),
        |g AS (
        |  SELECT *, """.stripMargin +
        s"CAST($MixBudgetTokens AS BIGINT) * wppm // 1000000 tgt, " +
        s"least(CAST($MixBudgetTokens AS BIGINT) * wppm // 1000000, " +
        s"avail * $MixMaxEpochsPpm // 1000000) gr FROM t)" + "\n" +
        """SELECT source, avail AS avail_tokens,
          |  CAST(wppm AS BIGINT) AS weight_ppm,
          |  CAST(tgt AS BIGINT) AS target_tokens,
          |  CAST(gr AS BIGINT) AS granted_tokens,
          |  CAST(CASE WHEN avail = 0 THEN 0
          |       ELSE gr * 1000000 // avail END AS BIGINT) AS epochs_ppm,
          |  CAST(tgt - gr AS BIGINT) AS shortfall_tokens
          |FROM g""".stripMargin),
    "x_mix_temp" ->
      """WITH ws AS (
        |  SELECT doc_id, source AS domain,
        |    len([w for w in string_split_regex(lower(text), '\s+') if w != '']) nt
        |  FROM documents),
        |dom AS (
        |  SELECT domain, CAST(sum(nt) AS BIGINT) dt FROM ws GROUP BY 1),
        |w AS (
        |  SELECT domain, dt,
        |    CAST(floor(sqrt(CAST(dt AS DOUBLE)) * 1000) AS BIGINT) w_milli
        |  FROM dom),
        |tot AS (
        |  SELECT CAST(sum(w_milli) AS BIGINT) w_tot,
        |    CAST(sum(dt) AS BIGINT) t_tot FROM w),
        |rt AS (
        |  SELECT domain,
        |    least(1000000, ((t_tot // 4) * 1000000 // w_tot) * w_milli // dt)
        |      AS rate_ppm
        |  FROM w CROSS JOIN tot)
        |SELECT doc_id, domain, CAST(nt AS BIGINT) AS n_tokens, rate_ppm,
        |  round(1000000.0 / rate_ppm, 6) AS weight
        |FROM ws JOIN rt USING (domain)
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      * 1000000 < rate_ppm * (CAST(1 AS BIGINT) << 32)""".stripMargin,
    // Replays the full-signature class key (x_dedup_sig's sig CTE), both
    // md5-bucket split assignments (50/25/25) and the straddle counts
    // over multi-member classes. Docs too short to sign get per-doc
    // 'nosig:' keys (singleton classes, filtered by n >= 2) — none exist
    // in the fixtures, but the replay mirrors the engine's contract.
    "x_split_nodup" ->
      """WITH ws AS (
        |  SELECT doc_id, [w for w in string_split_regex(trim(lower(text)), '\s+') if w != ''] w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat(w[i], ' ', w[i+1], ' ', w[i+2]) for i in range(1, len(w)-1)]) shingles
        |  FROM ws WHERE len(w) >= 3),
        |hs AS (
        |  SELECT doc_id, list_transform(shingles, s -> md5(s)) h FROM sh),
        |sig AS (
        |  SELECT doc_id,
        |    [list_aggregate(list_transform(h, x ->
        |       (CAST(('0x' || substr(x, 1, 12)) AS BIGINT) * (2*p+1)) % 4398046511104), 'min')
        |     for p in range(0, 16)] sig
        |  FROM hs),
        |k AS (
        |  SELECT d.doc_id,
        |    coalesce(md5(array_to_string(list_transform(s.sig, x -> CAST(x AS VARCHAR)), '|')),
        |             'nosig:' || CAST(d.doc_id AS VARCHAR)) skey
        |  FROM documents d LEFT JOIN sig s USING (doc_id)),
        |sp AS (
        |  SELECT skey,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 100 < 50 THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 100 < 75 THEN 'val'
        |         ELSE 'test' END AS doc_split,
        |    CASE WHEN CAST(('0x' || substr(md5(skey), 1, 12)) AS BIGINT) % 100 < 50 THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(skey), 1, 12)) AS BIGINT) % 100 < 75 THEN 'val'
        |         ELSE 'test' END AS class_split
        |  FROM k),
        |cls AS (
        |  SELECT skey, count(*) AS n, count(DISTINCT doc_split) AS nd,
        |    count(DISTINCT class_split) AS nc
        |  FROM sp GROUP BY 1)
        |SELECT count(*) AS n_multi_classes,
        |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle_dockeyed,
        |  CAST(sum(CASE WHEN nc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle_classkeyed
        |FROM cls WHERE n >= 2""".stripMargin,
    // Per-source unigram KL vs the corpus: p·ln(p/q) summed per source,
    // round(6) — the perplexity family's ln-parity discipline.
    "x_kl_drift" ->
      """WITH toks AS (SELECT source, unnest([w for w in
        |    string_split_regex(trim(lower(text)), '\s+') if w != '']) AS term
        |  FROM documents),
        |tf AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |corp AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS n FROM corp)
        |SELECT t.source, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  count(*) AS n_terms,
        |  round(sum(CAST(tf AS DOUBLE)
        |        * ln((CAST(tf AS DOUBLE) * n) / CAST(ctf AS DOUBLE)))
        |      / sum(tf) - ln(CAST(sum(tf) AS DOUBLE)), 6)
        |    AS kl_vs_corpus
        |FROM tf t JOIN corp USING (term), tot
        |GROUP BY 1""".stripMargin,
    // Replays the page construction AND the strip passes with the same
    // RE2-compatible patterns ('g' = replace-all, matching Spark's
    // default) and the same entity decode order (&amp; last).
    "x_html_strip" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id || '</title><script type="text/javascript">var a = 1 && b < 2; // <p>not text</p></script><style>.x { color: red; }</style></head><body><h1>Doc ' || doc_id || '</h1><p>' || text || '</p><p>Tom &amp; Jerry say &quot;hi&quot; &lt;3 &gt; &#39;ok&#39; literal &amp;lt;</p><!-- hidden <b>comment</b> --></body></html>' AS html
        |  FROM documents),
        |c AS (SELECT doc_id, CAST(length(html) AS BIGINT) AS n_chars_raw,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |        '<[^>]+>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, n_chars_raw,
        |  CAST(length(clean) AS BIGINT) AS n_chars_clean,
        |  md5(clean) AS clean_md5
        |FROM c""".stripMargin,
    // Closed-form least squares over ln(rank)/ln(tf), same deterministic
    // (tf DESC, term) ranking and round(6) float discipline.
    "x_zipf" ->
      """WITH toks AS (SELECT source, unnest([w for w in
        |    string_split_regex(trim(lower(text)), '\s+') if w != '']) AS term
        |  FROM documents),
        |tf AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |rk AS (SELECT source, term, tf, row_number() OVER (
        |    PARTITION BY source ORDER BY tf DESC, term) AS r FROM tf),
        |pts AS (SELECT source, tf, ln(CAST(r AS DOUBLE)) AS x,
        |    ln(CAST(tf AS DOUBLE)) AS y
        |  FROM rk WHERE r <= 30),
        |s AS (SELECT source, count(*) AS n, min(tf) AS tf_min,
        |    max(tf) AS tf_max, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM pts GROUP BY 1)
        |SELECT source, n AS n_terms_fit,
        |  CASE WHEN n < 2 THEN NULL
        |    ELSE round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) END
        |    AS zipf_slope,
        |  CASE WHEN n < 2 OR tf_min = tf_max THEN NULL
        |    ELSE round(pow(n*sxy - sx*sy, 2)
        |      / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) END AS r2
        |FROM s""".stripMargin,
    // Same least-squares replay over per-doc (ln tokens, ln distinct)
    // points; degenerate (all-equal-size) groups yield NULL.
    "x_heaps" ->
      """WITH ws AS (SELECT source, [w for w in
        |    string_split_regex(trim(lower(text)), '\s+') if w != ''] AS w
        |  FROM documents),
        |pts AS (SELECT source, len(w) AS nt,
        |    ln(CAST(len(w) AS DOUBLE)) AS x,
        |    ln(CAST(len(list_distinct(w)) AS DOUBLE)) AS y
        |  FROM ws WHERE len(w) > 0),
        |s AS (SELECT source, count(*) AS n, min(nt) AS nt_min,
        |    max(nt) AS nt_max, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy
        |  FROM pts GROUP BY 1)
        |SELECT source, n AS n_docs_fit,
        |  CASE WHEN n < 2 OR nt_min = nt_max THEN NULL
        |    ELSE round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) END
        |    AS heaps_beta
        |FROM s""".stripMargin
  )
}
