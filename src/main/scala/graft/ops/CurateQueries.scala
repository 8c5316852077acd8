package graft.ops

import graft.{QueryPack, Tables}
import graft.api.GraftOps
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** x_dedup_embed_cluster: semantic duplicate clusters — connected
    * components over the embedding-cosine near-dup pairs; the semantic
    * analog of x_dedup_cluster, composed from the same two operators.
    */
  def dedupEmbedCluster(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    GraftOps.clusterPairs(
      GraftOps.dedupEmbed(emb, col("vec_id"), col("embedding"),
          planes = GraftOps.planesFor(emb.count(), 64), dim = 64,
          threshold = 0.4)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
  }

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

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "x_frame_sample" -> frameSample,
    "x_dedup_para" -> dedupPara,
    "x_mix_domain" -> mixDomain,
    "x_bm25" -> bm25,
    "q_cdc_merge" -> cdcMerge,
    "x_dedup_incr" -> dedupIncr,
    "x_perplexity" -> perplexity,
    "x_dedup_embed_cluster" -> dedupEmbedCluster
  )

  val oracle = Map(
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
        |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin
  )
}
