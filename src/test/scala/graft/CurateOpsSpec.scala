package graft

import graft.api.GraftOps
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Semantic checks for the second curation pack (CurateQueries) on small
  * synthetic inputs with hand-computed expectations — the hash gate proves
  * engine parity at sf0.01; these pin the operator semantics themselves.
  */
class CurateOpsSpec extends SparkSpec {

  test("dedupParagraphs drops exactly the cross-doc paragraphs") {
    import spark.implicits._
    // "footer" appears in all 3 docs (boiler at minDocs=3); "shared"
    // appears in 2 (kept); each doc has one unique para.
    val docs = Seq(
      (1L, Seq("alpha beta", "shared line", "footer")),
      (2L, Seq("gamma delta", "shared line", "footer")),
      (3L, Seq("epsilon zeta eta", "footer"))
    ).toDF("doc_id", "paras")
    val out = GraftOps.dedupParagraphs(docs, col("doc_id"), col("paras"),
        minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_paras", "n_boiler", "n_tokens_kept", "kept_md5")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ===
      Seq((1L, 3L, 1L, 4L), (2L, 3L, 1L, 4L), (3L, 2L, 1L, 3L)))
    // kept content is the doc minus the footer, in paragraph order
    val md5Of = (s: String) =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    assert(out(0).getString(4) === md5Of("alpha beta shared line"))
    assert(out(2).getString(4) === md5Of("epsilon zeta eta"))
  }

  test("dedupParagraphs keeps everything when nothing crosses minDocs") {
    import spark.implicits._
    val docs = Seq((1L, Seq("a b", "c")), (2L, Seq("d", "e f g")))
      .toDF("doc_id", "paras")
    val out = GraftOps.dedupParagraphs(docs, col("doc_id"), col("paras"), 2)
      .agg(sum("n_boiler"), sum("n_tokens_kept")).collect()(0)
    assert(out.getLong(0) === 0L && out.getLong(1) === 7L)
  }

  test("mixDomains realizes the token budget as a ppm rate with HT weight") {
    import spark.implicits._
    // domain A: 4 docs x 50 tokens = 200 total, budget 100 -> rate 500000
    // domain B: 2 docs x 10 tokens = 20 total, budget 100 -> rate capped 1e6
    val docs = ((1 to 4).map(i => (i.toLong, "A", 50L, 100L)) ++
      Seq((10L, "B", 10L, 100L), (11L, "B", 10L, 100L)))
      .toDF("doc_id", "dom", "nt", "budget")
    val out = GraftOps.mixDomains(docs, col("doc_id"), col("dom"), col("nt"),
      col("budget"))
    val rates = out.select("domain", "rate_ppm", "weight").distinct()
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(rates("B") === ((1000000L, 1.0)))
    if (rates.contains("A")) assert(rates("A") === ((500000L, 2.0)))
    // rate-1e6 domains keep every doc
    assert(out.filter(col("domain") === "B").count() === 2L)
    // selection is partitioning-independent (md5-keyed, no RNG)
    val re = GraftOps.mixDomains(docs.repartition(7), col("doc_id"),
      col("dom"), col("nt"), col("budget"))
    assert(out.except(re).isEmpty && re.except(out).isEmpty)
  }

  test("bm25Rank orders by term rarity and saturates with doc length") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common common common filler filler filler"),
      (3L, "filler filler filler filler filler filler")
    ).toDF("id", "txt")
    val out = GraftOps.bm25Rank(docs, col("id"), col("txt"),
      terms = Seq("rare", "common"), k = 10).orderBy("rank").collect()
    // doc 3 matches nothing -> absent; doc 1 has the rare term -> rank 1
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L))
    val s1 = out(0).getDouble(1)
    val s2 = out(1).getDouble(1)
    assert(s1 > s2 && s2 > 0.0)
  }

  test("dedupIncremental flags delta-vs-corpus dups, not delta-internal") {
    import spark.implicits._
    val mk = (n: Int) => (0 until 60).map(i => s"w${(i * n) % 7}x$i").mkString(" ")
    val existing = Seq((1L, mk(1)), (2L, mk(2))).toDF("id", "txt")
    val delta = Seq(
      (10L, mk(1)),                       // exact copy of existing 1
      (11L, mk(2) + " tailword"),         // near copy of existing 2
      (12L, mk(5)),                       // fresh
      (13L, mk(6)), (14L, mk(6))          // delta-internal dup pair: both kept
    ).toDF("id", "txt")
    val out = GraftOps.dedupIncremental(existing, delta, col("id"), col("txt"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (10L, 1L, 1L, 0L),   // exact dup is also a trivial near dup
      (11L, 0L, 1L, 0L),
      (12L, 0L, 0L, 1L),
      (13L, 0L, 0L, 1L),
      (14L, 0L, 0L, 1L)))
  }

  test("perplexity computes add-one unigram NLL exactly") {
    import spark.implicits._
    // corpus tokens: a a b -> p(a)=(2+1)/(3+2)=0.6, p(b)=(1+1)/5=0.4
    val docs = Seq((1L, "a a"), (2L, "b")).toDF("id", "txt")
    val out = GraftOps.perplexity(docs, col("id"), col("txt"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 1L))
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    assert(out(0).getDouble(2) === r6(-math.log(0.6)))
    assert(out(1).getDouble(2) === r6(-math.log(0.4)))
    assert(out(0).getDouble(3) === r6(1.0 / 0.6))
    assert(out(1).getDouble(3) === r6(2.5))
  }

  test("sampleFrames emits every stride-th index, capped at maxFrames") {
    import spark.implicits._
    val media = Seq((1L, "fpA", 3L), (2L, "fpB", 20L), (3L, "fpC", 100L))
      .toDF("id", "fp", "nf")
    val out = GraftOps.sampleFrames(media, col("id"), col("fp"), col("nf"),
        stride = 8, maxFrames = 4)
      .groupBy("doc_id")
      .agg(collect_list(col("frame_idx")).as("idx"),
        max(col("ts_ms")).as("maxts"))
      .orderBy("doc_id").collect()
    // nf=3 -> only frame 0; nf=20 -> 0,8,16; nf=100 -> capped at 4 samples
    assert(out(0).getSeq[Long](1).sorted === Seq(0L))
    assert(out(1).getSeq[Long](1).sorted === Seq(0L, 8L, 16L))
    assert(out(2).getSeq[Long](1).sorted === Seq(0L, 8L, 16L, 24L))
    assert(out(2).getLong(2) === 24L * 40L)
  }

  test("cdcMerge: last write wins, trailing delete erases the key") {
    import spark.implicits._
    val changes = Seq(
      // key 1: upsert then delete -> gone
      (1L, 10L, 1L, "put", 1.0), (1L, 20L, 2L, "del", 0.0),
      // key 2: delete then re-insert -> survives with the later value
      (2L, 10L, 3L, "del", 0.0), (2L, 30L, 4L, "put", 7.5),
      // key 3: same version, tiebreak decides
      (3L, 10L, 5L, "put", 1.0), (3L, 10L, 6L, "put", 2.0)
    ).toDF("k", "v", "id", "op", "value")
    val out = GraftOps.cdcMerge(changes, col("k"), col("v"), col("id"),
        col("op"), col("value"), deleteOp = "del")
      .orderBy("key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (2L, 2L, 30L, "put", 7.5),
      (3L, 2L, 10L, "put", 2.0)))
  }

  test("dedupSubstrings flags cross-doc and in-doc repeated spans") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),       // 3 windows; shares "a b c" with doc 2
      (2L, "x a b c y"),       // 3 windows; shares "a b c" with doc 1
      (3L, "p q r p q r p q"), // 6 windows, every hash occurs twice in-doc
      (4L, "m n o q"),         // 2 windows, both unique
      (5L, "s t")              // < window tokens -> no window, excluded
    ).toDF("doc_id", "text")
    val out = GraftOps.dedupSubstrings(docs, col("doc_id"), col("text"),
        window = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getInt(4))).toSeq ===
      Seq((1L, 3L, 1L, 1), (2L, 3L, 1L, 1), (3L, 6L, 6L, 1),
        (4L, 2L, 0L, 0)))
    assert(out(2).getDouble(3) === 1.0) // doc 3 is 100% duplicated spans
  }

  /** Brute-force maximal-span oracle + engine run for one cap — cap=8
    * exercises the direct capped-sort strategy, cap=256 the prefix-
    * doubling rounds (the DirectSortCap pick is internal, so BOTH
    * strategies stay gated against the same ground truth).
    */
  private def checkDedupSuffix(cap: Int, seed: Int = 0): Unit = {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),      // shares "a b c d e f g h"
      (2L, "x y a b c d e f g h q r"),      //   ... with doc 1 (8 tokens)
      (3L, "z z z q w"),                    // in-doc overlap: "z z" twice
      (4L, "m n o"),                        // nothing duplicated
      (5L, "a b c d e f g h i j k l")       // exact twin of doc 1
    ).toDF("doc_id", "text")
    val minSpan = 3
    // brute force over the same tokenization: dup_len(doc, pos) = the
    // longest common prefix (capped) between this suffix and ANY other
    // suffix in the corpus; then the same interval-union coverage
    val toks = Seq(1L, 2L, 3L, 4L, 5L).zip(Seq(
      "a b c d e f g h i j k l", "x y a b c d e f g h q r",
      "z z z q w", "m n o", "a b c d e f g h i j k l")
      .map(_.split(" ").toSeq)).toMap
    val sufs = for {
      (d, w) <- toks.toSeq; p <- w.indices
    } yield (d, p)
    def lcp(a: (Long, Int), b: (Long, Int)): Int = {
      val (wa, wb) = (toks(a._1), toks(b._1))
      var k = 0
      while (k < cap && a._2 + k < wa.size && b._2 + k < wb.size &&
        wa(a._2 + k) == wb(b._2 + k)) k += 1
      k
    }
    val dupLen = sufs.map { s =>
      s -> sufs.filter(_ != s).map(o => lcp(s, o)).max
    }.toMap
    val expected = toks.toSeq.map { case (d, w) =>
      val dls = w.indices.map(p => dupLen((d, p)))
      var covered = 0
      var runEnd = -1
      w.indices.foreach { p =>
        if (dls(p) >= minSpan) runEnd = math.max(runEnd, p + dls(p))
        if (runEnd > p) covered += 1
      }
      (d, w.size.toLong, dls.max.toLong,
        dls.count(_ >= minSpan).toLong, covered.toLong,
        BigDecimal(covered.toDouble / w.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val out = GraftOps.dedupSuffix(docs, col("doc_id"), col("text"),
        minSpan = minSpan, cap = cap, partitions = 4, seed = seed)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(out === expected)
    // sanity on the planted structure: docs 1 and 5 are exact twins, so
    // their whole 12 tokens duplicate (clipped at the cap when cap < 12)
    assert(out.head._3 === math.min(cap, 12).toLong && out.head._6 === 1.0)
    // doc 3's "z z" overlap is below minSpan: positions counted, none
    assert(out(2)._3 === 2L && out(2)._4 === 0L && out(2)._5 === 0L)
    // doc 4 is fully unique
    assert(out(3)._3 === 0L && out(3)._6 === 0.0)
  }

  test("dedupSuffix matches a brute-force maximal-span oracle exactly " +
    "(direct capped-sort strategy, cap=8)") {
    checkDedupSuffix(cap = 8)
  }

  test("dedupOnion cuts exactly the covered spans and keeps the rest " +
    "in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),      // twin of doc 5: fully cut
      (2L, "x y a b c d e f g h q r"),      // shared middle cut
      (3L, "z z z q w"),                    // overlaps below minSpan kept
      (4L, "m n o"),                        // untouched
      (5L, "a b c d e f g h i j k l")
    ).toDF("doc_id", "text")
    val md5Of = (s: String) =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val out = GraftOps.dedupOnion(docs, col("doc_id"), col("text"),
        minSpan = 3, cap = 8, partitions = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out === Seq(
      (1L, 12L, 0L, 12L, md5Of("")),
      (2L, 12L, 4L, 8L, md5Of("x y q r")),
      (3L, 5L, 5L, 0L, md5Of("z z z q w")),
      (4L, 3L, 3L, 0L, md5Of("m n o")),
      (5L, 12L, 0L, 12L, md5Of(""))))
  }

  test("dedupSuffix matches the same oracle through the prefix-doubling " +
    "strategy (cap=256)") {
    checkDedupSuffix(cap = 256)
  }

  // output is seed-invariant (the seed is a pure cost knob): the gate's
  // seed=64 configuration must agree with the same brute-force oracle
  // the default-seed doubling run matches — at this fixture the seed
  // exceeds every doc length, so every post-seed class is already a
  // singleton and the first round trips the early-stop path
  test("dedupSuffix doubling strategy is seed-invariant (cap=256, " +
    "seed=64 — the standing gate's configuration)") {
    checkDedupSuffix(cap = 256, seed = 64)
  }

  // ---- independent unigram-LM replay (plain Scala, no Spark) --------
  private def uniMicroLog(x: Double): Long =
    BigDecimal(math.log(x) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def uniViterbi(word: String, wts: Map[String, Long],
                         maxLen: Int): (Long, String) = {
    // dp(i) = best (score, seg) for the i-char prefix; ties prefer the
    // lexicographically GREATEST seg — the engine's array_max rule
    val dp = new Array[(Long, String)](word.length + 1)
    dp(0) = (0L, "")
    (1 to word.length).foreach { i =>
      var best: (Long, String) = null
      (1 to math.min(maxLen, i)).foreach { k =>
        val piece = word.substring(i - k, i)
        if (wts.contains(piece) && dp(i - k) != null) {
          val c = (dp(i - k)._1 + wts(piece), dp(i - k)._2 + s"<$piece>")
          if (best == null || c._1 > best._1 ||
            (c._1 == best._1 && c._2 > best._2)) best = c
        }
      }
      dp(i) = best
    }
    dp(word.length)
  }

  private def uniReplay(words: Map[String, Long], rounds: Int, maxLen: Int,
                        seedMultis: Int, target: Int)
      : (Seq[(String, Long, Long, Long)], Seq[Map[String, Long]]) = {
    val seed = words.toSeq.flatMap { case (w, f) =>
      for (i <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - i))
        yield (w.substring(i, i + l), f)
    }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
    val singles = seed.filter(_._1.length == 1).toSeq
    val multis = seed.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMultis)
    val vocab = (singles ++ multis).map(_._1).sorted
    val seedTotal = (singles ++ multis).map(_._2).sum.toDouble
    val seedCnt = (singles ++ multis).toMap
    var wts = vocab.map(p => p -> uniMicroLog(seedCnt(p) / seedTotal)).toMap
    var counts = Map.empty[String, Long]
    val wtHistory = scala.collection.mutable.ArrayBuffer(wts)
    (1 to rounds).foreach { _ =>
      counts = words.toSeq.flatMap { case (w, f) =>
        val seg = uniViterbi(w, wts, maxLen)._2
        seg.substring(1, seg.length - 1).split("><").map(p => (p, f))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      val used = counts.values.sum.toDouble
      val v = vocab.size.toDouble
      wts = vocab.map(p =>
        p -> uniMicroLog((counts.getOrElse(p, 0L) + 1L) / (used + v))).toMap
      wtHistory += wts
    }
    val keepM = math.max(0, target - singles.length)
    val prunedM = multis.map(_._1).map(p => (p, counts.getOrElse(p, 0L)))
      .sortBy { case (p, c) => (-c, p) }.take(keepM)
    val pruned = (singles.map(x => (x._1, counts.getOrElse(x._1, 0L)))
      ++ prunedM).sortBy { case (p, c) => (-c, p) }
    val pTot = pruned.map(_._2).sum.toDouble
    val pV = pruned.size.toDouble
    (pruned.zipWithIndex.map { case ((p, c), i) =>
      (p, c, uniMicroLog((c + 1L) / (pTot + pV)), (i + 1).toLong)
    }, wtHistory.toSeq)
  }

  test("unigramTrain matches an independent hard-EM replay exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab abab cd abab"),
      (2L, "abab cd cd ab"),
      (3L, "cdcd abab ab")).toDF("doc_id", "text")
    val words = Map("abab" -> 5L, "cd" -> 3L, "ab" -> 2L, "cdcd" -> 1L)
    val (expected, _) = uniReplay(words, rounds = 2, maxLen = 3,
      seedMultis = 4, target = 8)
    val out = GraftOps.unigramTrain(docs, col("text"), rounds = 2,
        maxPieceLen = 3, seedMultis = 4, targetSize = 8, maxWordLen = 6)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === expected)
    // the planted dominant piece must win a multi-char slot
    assert(expected.exists { case (p, c, _, _) => p == "ab" && c > 0 })
  }

  test("mixBudget: epoch cap binds exactly, shortfall is the designer's " +
    "rebalance signal, unweighted sources fail loudly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "srcA"),                          // 4 tokens
      (2L, "a b c d e f g h i j k l", "srcB")           // 12 tokens
    ).toDF("doc_id", "text", "source")
    val out = GraftOps.mixBudget(docs, col("source"), col("text"),
        weightsPpm = Seq(("srcA", 500000L), ("srcB", 500000L)),
        budgetTokens = 20L, maxEpochsPpm = 2000000L)
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out === Seq(
      // srcA: target 10, capped at 4 tokens x 2 epochs = 8 -> short 2
      ("srcA", 4L, 500000L, 10L, 8L, 2000000L, 2L),
      // srcB: target 10 under the 24-token cap -> 10/12 epochs
      ("srcB", 12L, 500000L, 10L, 10L, 833333L, 0L)))
    val e = intercept[IllegalArgumentException] {
      GraftOps.mixBudget(docs, col("source"), col("text"),
        weightsPpm = Seq(("srcA", 500000L)), budgetTokens = 20L)
    }
    assert(e.getMessage.contains("no mixture weight"))
    // the symmetric direction is VISIBLE, not loud: a weighted source
    // absent from the corpus must emit (avail 0, granted 0, shortfall =
    // its whole target) — a left join from the avail side would have
    // silently evaporated its budget share
    val withGhost = GraftOps.mixBudget(docs, col("source"), col("text"),
        weightsPpm = Seq(("srcA", 400000L), ("srcB", 400000L),
          ("srcC", 200000L)),
        budgetTokens = 20L, maxEpochsPpm = 2000000L)
      .filter(col("source") === "srcC")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(withGhost === Array(("srcC", 0L, 200000L, 4L, 0L, 0L, 4L)))
  }

  test("boilerplateScreen: word floor and link density gate lines " +
    "independently; retained text reassembles in order; no-content " +
    "pages stay visible") {
    import spark.implicits._
    val page = Seq(
      "<a href=\"/\">Home</a> | <a href=\"/a\">About</a>",  // short+dense
      "this paragraph has nine real words of actual content",  // CONTENT
      // >= 8 words but EVERY word inside anchors: density arm drops it
      "<a href=\"/1\">one two three four</a> <a href=\"/2\">five six " +
        "seven eight nine</a>",
      // low-density inline link with enough words: CONTENT
      "another real paragraph with a tiny <a href=\"/t\">link</a> " +
        "inside it somewhere",
      "Thanks!"                                               // too short
    ).mkString("\n")
    val md5Of = (s: String) =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val out = GraftOps.boilerplateScreen(
        Seq((1L, page)).toDF("doc_id", "html"),
        col("doc_id"), col("html"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).head
    val kept1 = "this paragraph has nine real words of actual content"
    val kept2 = "another real paragraph with a tiny link inside it somewhere"
    assert(out === ((1L, 5L, 2L, (kept1.length + kept2.length).toLong,
      md5Of(kept1 + "\n" + kept2))))
    // a page with nothing retainable reports md5("") — visible row
    val none = GraftOps.boilerplateScreen(
        Seq((2L, "<a href=\"/\">Home</a>\nBye!")).toDF("doc_id", "html"),
        col("doc_id"), col("html"))
      .collect().head
    assert(none.getLong(2) === 0L && none.getString(4) === md5Of(""))
    // a NULL html column folds to "" and the document STAYS VISIBLE
    // (split(NULL) would otherwise emit zero lines and lose the row)
    val nul = GraftOps.boilerplateScreen(
        Seq((3L, null: String)).toDF("doc_id", "html"),
        col("doc_id"), col("html"))
      .collect()
    assert(nul.length === 1 && nul.head.getLong(0) === 3L &&
      nul.head.getLong(2) === 0L && nul.head.getString(4) === md5Of(""))
  }

  test("parseRobots: group boundaries, multi-UA headers, exact shadows " +
    "star, case folding, orphans and empty values dropped") {
    import spark.implicits._
    val fileA = Seq(
      "Disallow: /orphan",          // before any User-agent: ignored
      "User-agent: *",
      "Disallow: /all",
      "User-agent: GRAFTBOT",       // rule line above => NEW group;
      "User-agent: other",          // consecutive UA lines = one header
      "Allow: /bot/ok  # trailing comment",
      "Disallow:",                  // empty value: nothing disallowed
      "Disallow: /bot/trap").mkString("\n")
    // host B has no exact group: the star rules apply
    val fileB = Seq(
      "# only a star group here",
      "User-agent: *",
      "Disallow: /b").mkString("\n")
    val docs = Seq(("a.com", fileA), ("b.com", fileB)).toDF("h", "txt")
    val out = GraftOps.parseRobots(docs, col("h"), col("txt"),
        agent = "graftbot")
      .orderBy("host", "rule", "path")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out === Array(
      // exact group shadows star: /all must NOT apply to a.com
      ("a.com", "allow", "/bot/ok"),
      ("a.com", "disallow", "/bot/trap"),
      ("b.com", "disallow", "/b")))
    // a star-only agent argument is rejected loudly — '*' is a group
    // wildcard, not a crawler identity
    val e = intercept[IllegalArgumentException] {
      GraftOps.parseRobots(docs, col("h"), col("txt"), agent = "*")
    }
    assert(e.getMessage.contains("concrete"))
    // two documents sharing a host would interleave their line indexes
    // under the group windows — rejected loudly, never parsed wrong
    val dup = Seq(("a.com", fileA), ("a.com", fileB), ("b.com", fileB))
      .toDF("h", "txt")
    val e2 = intercept[IllegalArgumentException] {
      GraftOps.parseRobots(dup, col("h"), col("txt"), agent = "graftbot")
    }
    assert(e2.getMessage.contains("multiple robots documents") &&
      e2.getMessage.contains("a.com"))
  }

  test("filterUrls: canonical-host prefix rules, multi-rule hits count " +
    "once, host mismatch never blocks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://A.com/blocked/x"),     // rule hit via canonical host
      (2L, "https://a.com/blockedpage"),   // PREFIX semantics: also hit
      (3L, "https://a.com/ok"),
      (4L, "https://b.com/blocked/x")      // other host: kept
    ).toDF("doc_id", "u")
    // two overlapping rules — doc 1 matches both and must count ONCE
    val out = GraftOps.filterUrls(docs, col("doc_id"), col("u"),
        Seq(("a.com", "/blocked"), ("a.com", "/block")))
      .orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out === Seq(
      ("a.com", 3L, 2L, 1L),
      ("b.com", 1L, 0L, 1L)))
  }

  test("bpeFertility: occurrence-weighted pieces per word, exact ppm, " +
    "unsplit words counted under the served merge table") {
    import spark.implicits._
    val docs = Seq(
      // s1: 'aa' x2 merges whole (1 piece, unsplit), 'ab' stays 2 pieces
      (1L, "aa ab aa", "s1"),
      // s2: 'b' is a single char (1 piece, unsplit), 'ba' stays 2
      (2L, "b ba", "s2")).toDF("doc_id", "text", "source")
    val out = GraftOps.bpeFertility(docs, col("source"), col("text"),
        merges = Seq(("a", "a")))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Seq(
      ("s1", 3L, 4L, 1333333L, 2L),
      ("s2", 2L, 3L, 1500000L, 1L)))
  }

  test("canonicalizeUrl: case, default port, fragment, tracking params, " +
    "param order and trailing slash all fold; path case survives") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&b=2&a=1#frag",
      "https://www.example.com/A/B?a=1&b=2",
      "http://Host.com:80/",
      "http://host.com",
      "https://h.com/p?utm_campaign=c&ref=r&fbclid=f&gclid=g",
      // BARE tracking keys (no '='): crawls carry both spellings, and
      // 'utm_x' must fold by prefix while 'ref'/'fbclid'/'gclid' fold
      // by exact bare key — but 'refresh=1' is a REAL param that the
      // bare-key rule must NOT swallow
      "https://h.com/p?ref&fbclid&gclid&utm_x&refresh=1").toDF("u")
    val got = urls.select(GraftOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq(
      // the first two spellings MUST collapse to one identity
      "https://www.example.com/A/B?a=1&b=2",
      "https://www.example.com/A/B?a=1&b=2",
      "http://host.com/",
      "http://host.com/",
      // every param was tracking noise -> no '?' at all
      "https://h.com/p",
      // bare keys dropped; the lookalike real param survives
      "https://h.com/p?refresh=1"))
    // an input with no scheme canonicalizes to NULL (visible as its own
    // group), never to a shared junk key that fakes a duplicate class
    val malformed = Seq("not a url", "", "host.com/p").toDF("u")
      .select(GraftOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(malformed.forall(_.isEmpty))
    // a '?' INSIDE the fragment is fragment content, not a query: it
    // must vanish with the fragment, not leak into the canonical key
    val fragQ = Seq("https://a.com/p#sec?b=2").toDF("u")
      .select(GraftOps.canonicalizeUrl(col("u")).as("c"))
      .collect().head.getString(0)
    assert(fragQ === "https://a.com/p")
  }

  test("unigram seed cluster-side top-k equals the driver-side top-k " +
    "(orderBy+limit replay, ties included)") {
    import spark.implicits._
    // 'ababab' and 'cdcdcd' are frequency-tied, so several multi-char
    // substrings tie on cnt and only the (cnt desc, piece asc) rule
    // orders them — the case where a cluster-side TakeOrderedAndProject
    // with a sloppy tie-break would silently diverge from the old
    // driver-side sortBy((-c, p)).take(k)
    val words = Seq(("ababab", 3L), ("cdcdcd", 3L), ("ab", 2L), ("cd", 2L))
    val maxPieceLen = 3
    val seedCounts = words.toDF("word", "freq")
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(length(word), i + $maxPieceLen - 1)),
           |    j -> substr(word, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .repartition(8) // force multi-partition per-partition top-k
    val k = 5
    val clusterSide = seedCounts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val driverSide = seedCounts.filter(length(col("piece")) > 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, c) => (-c, p) }.take(k).toSeq
    assert(clusterSide === driverSide)
    // the fixture really has ties at the cut boundary
    assert(driverSide.map(_._2).distinct.size < driverSide.size)
  }

  test("unigram hard-EM corpus likelihood is non-decreasing per round") {
    val words = Map("abab" -> 5L, "cd" -> 3L, "ab" -> 2L, "cdcd" -> 1L,
      "abcd" -> 2L, "dcba" -> 1L)
    val (_, hist) = uniReplay(words, rounds = 4, maxLen = 3,
      seedMultis = 6, target = 12)
    // L(theta_r) = sum of freq * best-segmentation micro-log score; the
    // E-step re-segments optimally and the M-step re-weights toward the
    // chosen segmentation, so the Viterbi likelihood must not decrease
    // across the post-seed rounds (the seed->round-1 step may reshape
    // the objective: seed weights are occurrence-normalized, not
    // segmentation-normalized)
    val lik = hist.map(w =>
      words.map { case (wd, f) => f * uniViterbi(wd, w, 3)._1 }.sum)
    lik.sliding(2).drop(1).foreach { case Seq(a, b) =>
      assert(b >= a, s"likelihood decreased: $lik")
    }
  }

  test("dedupSuffix fails loudly on duplicate document keys") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (1L, "d e f"), (2L, "g h i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      GraftOps.dedupSuffix(docs, col("doc_id"), col("text"),
        minSpan = 2, cap = 4, partitions = 2)
    }
    assert(e.getMessage.contains("duplicate document keys"))
  }

  test("unigramApply fails loudly when a word is not coverable") {
    import spark.implicits._
    val docs = Seq((1L, "ab zz")).toDF("doc_id", "text")
    // piece table lacks 'z': 'zz' has no segmentation path
    val e = intercept[IllegalArgumentException] {
      GraftOps.unigramApply(docs, col("doc_id"), col("text"),
        Map("a" -> -10L, "b" -> -10L), maxPieceLen = 3)
    }
    assert(e.getMessage.contains("not coverable"))
  }

  test("unigramApply segments documents under the learned piece table") {
    import spark.implicits._
    val docs = Seq((1L, "abab cd"), (2L, "ab abab")).toDF("doc_id", "text")
    val (pieces, _) = uniReplay(Map("abab" -> 2L, "cd" -> 1L, "ab" -> 1L),
      rounds = 2, maxLen = 3, seedMultis = 4, target = 8)
    val wts = pieces.map(x => (x._1, x._3)).toMap
    val out = GraftOps.unigramApply(docs, col("doc_id"), col("text"),
        wts, maxPieceLen = 3)
      .orderBy("doc_id").collect()
    val md5Of = (s: String) =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val seg1 = uniViterbi("abab", wts, 3)._2 + uniViterbi("cd", wts, 3)._2
    val seg2 = uniViterbi("ab", wts, 3)._2 + uniViterbi("abab", wts, 3)._2
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq === Seq(
      (1L, seg1.count(_ == '<').toLong, md5Of(seg1)),
      (2L, seg2.count(_ == '<').toLong, md5Of(seg2))))
  }

  test("bpePairStats weights char pairs by corpus word frequency") {
    import spark.implicits._
    // wf: ab->3, cd->1, abc->1. pairs: 'ab' from both 'ab'(3) and
    // 'abc'(1) -> 4; 'bc' from 'abc' -> 1; 'cd' -> 1.
    val docs = Seq((1L, "ab ab cd"), (2L, "ab abc")).toDF("doc_id", "text")
    val out = GraftOps.bpePairStats(docs, col("text"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("ab", 4L, 1L), ("bc", 1L, 2L), ("cd", 1L, 3L)))
  }

  test("rrfFuse: exact-integer RRF points, absentees rank 0") {
    import spark.implicits._
    val lex = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val dense = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val out = GraftOps.rrfFuse(lex, dense, k = 10)
      .orderBy("fused_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 10^12 div 61 = 16393442622, 10^12 div 62 = 16129032258
    assert(out.toSeq === Seq(
      (2L, 16393442622L + 16129032258L, 2L, 1L, 1L), // in both lists
      (1L, 16393442622L, 1L, 0L, 2L),
      (3L, 16129032258L, 0L, 2L, 3L)))
  }

  test("gramsN equals sliding windows for every n over seeded random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(s"t${rnd.nextInt(5)}")
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5, 8)) {
      val got = df.select(col("doc_id"),
          TextFns.gramsN(TextFns.tokens(col("text")), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.trim.toLowerCase.split("\\s+")
          .filter(_.nonEmpty).toSeq
        val want =
          if (toks.size < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        assert(got(id) === want, s"doc $id n=$n")
      }
    }
  }

  test("pmiPairs: exact counts and the textbook PMI value") {
    import spark.implicits._
    // pairs: "a b" x2, "b a" x1; uni a:3 b:3; nt=6 tokens, np=3 pair slots
    val docs = Seq("a b", "a b", "b a").toDF("text")
    val out = GraftOps.pmiPairs(docs, col("text"), k = 10, minCount = 1)
      .orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    def pmi(pc: Double, ua: Double, ub: Double) =
      BigDecimal(math.log((pc / 3) / ((ua / 6) * (ub / 6))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(
      ("a b", 2L, 3L, 3L, pmi(2, 3, 3), 1L),
      ("b a", 1L, 3L, 3L, pmi(1, 3, 3), 2L)))
  }

  test("vocabCoverage: cumulative ppm share reaches exactly 1e6") {
    import spark.implicits._
    val docs = Seq("a a b c").toDF("text")
    val out = GraftOps.vocabCoverage(docs, col("text"), k = 10)
      .orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      ("a", 2L, 1L, 500000L), ("b", 1L, 2L, 750000L),
      ("c", 1L, 3L, 1000000L)))
  }

  test("lengthHistogram: exact integer buckets and ppm shares") {
    import spark.implicits._
    def doc(n: Int) = Seq.fill(n)("t").mkString(" ")
    val docs = Seq(doc(1), doc(31), doc(32), doc(100)).toDF("text")
    val out = GraftOps.lengthHistogram(docs, col("text"), width = 32)
      .orderBy("bucket_lo")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (0L, 2L, 1L, 31L, 500000L),
      (32L, 1L, 32L, 32L, 250000L),
      (96L, 1L, 100L, 100L, 250000L)))
  }

  test("perplexityBigram: textbook Laplace bigram values") {
    import spark.implicits._
    // unigrams over the >=2-token population: a:3 b:3, vocab 2.
    // bigram counts: (a,b):2, (b,a):2 -> p = (2+1)/(3+2) = 0.6 for every
    // pair either doc contains, so both docs score avg_nll = -ln(0.6).
    val docs = Seq((1L, "a b a b"), (2L, "b a"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = GraftOps.perplexityBigram(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nlp = -math.log((2 + 1.0) / (3 + 2))
    // doc 3 has one token -> no pair -> excluded
    assert(out.toSeq === Seq(
      (1L, 3L, r6(nlp), r6(math.exp(nlp))),
      (2L, 1L, r6(nlp), r6(math.exp(nlp)))))
  }

  test("knnGraph with one cell equals the brute-force k-NN graph") {
    import spark.implicits._
    val raw = (0 until 8).map { i =>
      val t = i * 0.37
      (i.toLong, Seq(math.cos(t).toFloat, math.sin(t).toFloat,
        (0.1 * i).toFloat))
    }
    val vecs = raw.toDF("vec_id", "embedding")
    val got = GraftOps.knnGraph(vecs, k = 3, nlist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    // brute force with the operator's exact arithmetic: float->double cast,
    // sequential dot, round HALF_UP at 6
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (da, db) = (a.map(_.toDouble), b.map(_.toDouble))
      val dot = da.zip(db).map { case (x, y) => x * y }.sum
      val c = dot / (math.sqrt(da.map(x => x * x).sum) *
        math.sqrt(db.map(x => x * x).sum))
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = raw.flatMap { case (i, vi) =>
      raw.filter(_._1 != i)
        .map { case (j, vj) => (j, cos(vi, vj)) }
        .sortBy { case (j, c) => (-c, j) }
        .take(3).zipWithIndex
        .map { case ((j, c), r) => (i, j, c, (r + 1).toLong) }
    }.toSet
    assert(got === want)
  }

  test("epochShuffle: each epoch is a full permutation, epochs differ, replay is bit-identical") {
    import spark.implicits._
    val docs = (0L until 100L).toSeq.toDF("doc_id")
    val out = GraftOps.epochShuffle(docs, col("doc_id"), epochs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 200)
    val byEpoch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byEpoch(0L).toSet === (0L until 100L).toSet, "epoch 0 must cover every doc")
    assert(byEpoch(1L).toSet === (0L until 100L).toSet, "epoch 1 must cover every doc")
    assert(byEpoch(0L) !== byEpoch(1L), "epochs must order independently")
    assert(byEpoch(0L) !== (0L until 100L).toSeq, "order must not be the identity")
    val replay = GraftOps.epochShuffle(docs, col("doc_id"), epochs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === replay.toSeq, "the shuffle must be deterministic")
  }

  test("decontaminateEmbed flags exactly the planted benchmark copy") {
    import spark.implicits._
    val bench = Seq((0L, Array(1.0f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(1.0f, 0f, 0f, 0f)), // exact copy of bench 0 → cos 1
      (11L, Array(0f, 0f, 1f, 0f)))   // orthogonal to both → cos 0
      .toDF("vec_id", "embedding")
    val out = GraftOps.decontaminateEmbed(corpus, bench, threshold = 0.9)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(2))).toSeq ===
      Seq((10L, 1), (11L, 0)))
    assert(out.head.getDouble(1) === 1.0)
  }

  test("mixTemperature up-samples the tail domain by the sqrt ratio") {
    import spark.implicits._
    // head: 10000 tokens over 100 docs; tail: 100 tokens over 10 docs.
    // Exact expectations: B = (10100 div 4) = 2525; w_head = 100000,
    // w_tail = 10000 milli; quota q = 2525*10^6 div 110000 = 22954
    // ppm/milliweight; rate_head = 22954*100000 div 10000 = 229540 ppm;
    // rate_tail = 22954*10000 div 100 = 2295400 -> caps at 10^6.
    val docs = ((1 to 100).map(i => (i.toLong, "head", 100)) ++
      (101 to 110).map(i => (i.toLong, "tail", 10)))
      .toDF("doc_id", "dom", "nt")
    val out = GraftOps.mixTemperature(docs, col("doc_id"), col("dom"),
      col("nt")).persist()
    val rates = out.select(col("domain"), col("rate_ppm")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("tail") === 1000000L, "tail domain must be fully kept")
    assert(rates("head") === 229540L, "head rate must be the exact rational")
    assert(out.filter(col("domain") === "tail").count() === 10L,
      "full-keep rate means every tail doc survives")
    out.unpersist()
  }

  test("curriculumOrder: quality scores never increase down the schedule") {
    val out = GraftOps.curriculumOrder(Tables.documents(spark, sf),
      col("doc_id"), col("text")).collect()
    assert(out.nonEmpty)
    val scores = out.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "schedule must be easy-to-hard")
  }

  test("ccnetBuckets: buckets are ppl-ordered and quartile-sized per lang") {
    val out = GraftOps.ccnetBuckets(Tables.documents(spark, sf),
      col("doc_id"), col("text"), col("lang")).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_.getString(4))
        .view.mapValues(_.map(_.getDouble(3))).toMap
      // ordering: every head ppl <= every middle ppl <= every tail ppl
      for {h <- byBucket.get("head"); m <- byBucket.get("middle")}
        assert(h.max <= m.min, s"$lang: head above middle")
      for {m <- byBucket.get("middle"); t <- byBucket.get("tail")}
        assert(m.max <= t.min, s"$lang: middle above tail")
      // sizing: head <= 25% + ties, tail <= 75% complement + ties — with
      // distinct ppls the head is at most ceil(n/4) + 1 and the middle
      // about half; assert the coarse shape, exact parity is the gate's job
      val n = rows.length
      byBucket.get("head").foreach(h =>
        assert(h.length <= n / 2 + 1, s"$lang: head oversized"))
      byBucket.get("tail").foreach(t =>
        assert(t.length <= n / 2 + 1, s"$lang: tail oversized"))
    }
  }

  test("perplexityInterp: textbook JM mixture on a two-doc corpus") {
    import spark.implicits._
    // corpus: "a b a b" and "a c" -> unigrams a=3 b=2 c=1 (N=6),
    // bigrams (a,b)=2 (b,a)=1 (a,c)=1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = 0.75 * 2 / 3 + 0.25 * 2 / 6
    val pBA = 0.75 * 1 / 2 + 0.25 * 3 / 6
    val pAC = 0.75 * 1 / 3 + 0.25 * 1 / 6
    val nll1 = (-math.log(pAB)) * 2 + (-math.log(pBA))
    val got = GraftOps.perplexityInterp(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) === ((3L, r6(nll1 / 3), r6(math.exp(nll1 / 3)))))
    assert(got(2L) === ((1L, r6(-math.log(pAC)), r6(math.exp(-math.log(pAC))))))
    // JM backs off to the unigram, never past it: every probability is a
    // convex mix of two terms <= 1, so ppl is bounded below by 1
    assert(got.values.forall(_._3 >= 1.0))
  }

  test("pqEncode/pqSearch: hand-computed codes, ties, and ADC ranking") {
    import spark.implicits._
    // m=2 subspaces of 1 dim, ksub=2 codewords (= v0, v1 sub-vectors)
    val emb = Seq(
      (0L, Seq(0.0f, 0.0f)),   // codeword 0 per subspace
      (1L, Seq(1.0f, 10.0f)),  // codeword 1 per subspace
      (2L, Seq(0.2f, 9.0f)),   // -> codes (0, 1)
      (3L, Seq(0.6f, 4.0f)),   // -> codes (1, 0)
      (4L, Seq(0.5f, 5.0f))    // exact tie both subspaces -> lower code 0
    ).toDF("vec_id", "embedding")
    val codes = GraftOps.pqEncode(emb, m = 2, subDim = 1, ksub = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(codes === Map(
      (0L, 0L) -> 0L, (0L, 1L) -> 0L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L,
      (2L, 0L) -> 0L, (2L, 1L) -> 1L,
      (3L, 0L) -> 1L, (3L, 1L) -> 0L,
      (4L, 0L) -> 0L, (4L, 1L) -> 0L))
    // ADC from probe v0: LUT sub0 = {0, 1e6}, sub1 = {0, 1e8} micro-units;
    // v4 quantizes onto v0's codes, so its approximate distance is 0 —
    // quantization loss made visible, ranked by (adist, vec_id)
    val adc = GraftOps.pqSearch(emb, emb.filter($"vec_id" === 0L), k = 5,
        m = 2, subDim = 1, ksub = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(adc.sortBy(_._3) === Seq(
      (0L, 0L, 1L), (4L, 0L, 2L), (3L, 1000000L, 3L),
      (2L, 100000000L, 4L), (1L, 101000000L, 5L)))
  }

  test("pqEncode fails loud when embedding dim != m*subDim") {
    import spark.implicits._
    val emb = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    // m*subDim = 4 over 2-dim vectors: the short slice must raise on the
    // codebook rows, not silently assign via NULL-first struct ordering
    val e = intercept[Exception] {
      GraftOps.pqEncode(emb, m = 2, subDim = 2, ksub = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("m*subDim")))
  }

  test("topComponent: hand-computed power iteration on a diagonal Gram matrix") {
    import spark.implicits._
    // vectors (3,0) and (0,1): Gram = diag(9,1); from all-ones the
    // iteration tilts to the dominant axis — u1=(9,1), u2=(81,1)/sqrt82
    val emb = Seq((0L, Seq(3.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n2 = math.sqrt(81.0 * 81.0 + 1.0)
    val expected = Map(0L -> r6(81.0 / n2), 1L -> r6(1.0 / n2))
    val got = GraftOps.topComponent(emb, dim = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expected)
    // the returned direction is unit-norm (within rounding)
    val fix = GraftOps.topComponent(Tables.embeddings(spark, sf),
      dim = 64, iters = 2).collect().map(_.getDouble(1))
    val norm = fix.map(c => c * c).sum
    assert(math.abs(norm - 1.0) < 1e-4, s"norm^2 = $norm")
  }

  test("bootstrapCi: 1-row groups get a degenerate band, never NULL bounds") {
    import spark.implicits._
    // ~37% of a 1-row group's replicas draw weight 0 -> NULL means; the
    // survivors' means all equal the single value, so the band must be
    // exactly [v, v] (NULLs filtered, ranks from the non-null set only)
    val one = Seq(("g", 1L, 42L)).toDF("grp", "id", "x")
    val ci = GraftOps.bootstrapCi(one, col("grp"), col("id"), col("x"),
      reps = 32).collect()
    assert(ci.length === 1)
    assert(ci.head.getDouble(1) === 42.0)
    assert(ci.head.getDouble(2) === 42.0 && ci.head.getDouble(3) === 42.0)
  }

  test("bootstrapCi replays from a plain-Scala Poisson bootstrap") {
    def md5hex12(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pois(u: Double): Long = {
      val i = GraftOps.PoissonCum.indexWhere(u < _)
      if (i < 0) 5L else i.toLong
    }
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val means = (0 until 32).map { b =>
        var (swx, sw) = (0L, 0L)
        rows.foreach { case (_, id, x) =>
          val u = (md5hex12(s"$id|$b") + 0.5) / 281474976710656.0
          val w = pois(u); swx += w * x; sw += w
        }
        (swx.toDouble / sw.toDouble, b)
      }.sorted
      val est = rows.map(_._3).sum.toDouble / rows.length.toDouble
      src -> ((r6(est), r6(means(1)._1), r6(means(30)._1)))
    }
    val got = ops.CurateQueries.queries("x_bootstrap")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === expected)
    // the band brackets: lo <= hi by construction of the order statistics
    got.values.foreach { case (_, lo, hi) => assert(lo <= hi) }
  }

  test("x_dp_counts replays from a plain-Scala Laplace inverse-CDF") {
    def md5hex12(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val counts = Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val expected = counts.map { case (src, n) =>
      val u = (md5hex12(src) + 0.5) / 281474976710656.0
      val noise = -math.signum(u - 0.5) * math.log(1 - 2 * math.abs(u - 0.5))
      src -> r6(n + noise)
    }.toMap
    val got = ops.CurateQueries.queries("x_dp_counts")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === expected)
    // ε=1 Laplace noise is symmetric and usually small: every released
    // count stays within a plausible band of the truth at fixture scale
    counts.foreach { case (src, n) =>
      assert(math.abs(got(src) - n) < 35.0, s"$src noise implausibly large")
    }
  }

  test("x_sample_weighted replays exactly from a plain-Scala ES computation") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def md5hex12(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
    }
    val expected = docs.filter(_._3 > 0).groupBy(_._1).toSeq.flatMap {
      case (src, rows) =>
        rows.toSeq.map { case (_, id, w) =>
          val u = (md5hex12(id.toString) + 1).toDouble / 281474976710656.0
          (id, math.log(u) / w)
        }.sortBy { case (id, k) => (-k, id) }.take(5)
          .map { case (id, _) => (src, id) }
    }.toSet
    val got = ops.CurateQueries.queries("x_sample_weighted")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("x_sample_weighted favors heavy docs at the rate the weights imply") {
    // aggregate inclusion bias across sources: the mean n_chars of
    // sampled docs must exceed the corpus mean (weight ∝ n_chars), by
    // enough margin that a uniform sampler would essentially never show
    val all = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val sampled = ops.CurateQueries.queries("x_sample_weighted")(spark, sf)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampled > all,
      f"sampled mean $sampled%.1f should exceed corpus mean $all%.1f")
  }

  test("evalMetrics computes exact per-class precision/recall by hand") {
    import spark.implicits._
    val pred = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("c", "b"))
      .toDF("actual", "predicted")
    val m = GraftOps.evalMetrics(pred, col("actual"), col("predicted"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
    assert(m("a") === ((2L, 1L, 1L, Some(1000000L), Some(500000L))))
    assert(m("b") === ((1L, 3L, 1L, Some(333333L), Some(1000000L))))
    assert(m("c") === ((1L, 0L, 0L, None, Some(0L))))
  }

  test("naiveBayes predicts the textbook argmax on a hand corpus") {
    import spark.implicits._
    // en: {cat:3} over 2 docs; fr: {chat:1} over 1 doc; V=2.
    // "chat" -> fr (en never saw it; fr's likelihood + prior wins);
    // both cat docs -> en.
    val docs = Seq((1L, "cat cat", "en"), (2L, "chat", "fr"),
      (3L, "cat", "en")).toDF("doc_id", "text", "lang")
    val out = GraftOps.naiveBayes(docs, col("doc_id"), col("text"),
        col("lang"))
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getInt(3))))
      .toMap
    assert(out(1L) === (("en", 1)))
    assert(out(2L) === (("fr", 1)))
    assert(out(3L) === (("en", 1)))
  }

  test("langSegment: per-paragraph NB calls roll up to dominant share " +
    "and mixed flag; blank paras skipped; pageless docs stay visible") {
    import spark.implicits._
    // model (hand-derived): en trains on docs 1+3 (aa:4, bb:2, t_c=6,
    // n_docs_c=2), fr on doc 2 (xx:3, yy:2, t_c=5), V=4, n_docs=3.
    // doc 1's page: "aa bb"->en, "xx yy"->fr, ""->skipped, "aa"->en
    // (scores hand-checked, e.g. "xx yy": fr -3.008 beats en -5.011).
    val docs = Seq(
      (1L, "aa bb\nxx yy\n\naa", "aa bb aa bb aa", "en"),
      (2L, "xx yy xx", "xx yy xx yy xx", "fr"),
      (3L, null: String, "aa", "en")
    ).toDF("doc_id", "page", "train", "lang")
    val out = GraftOps.langSegment(docs, col("doc_id"), col("page"),
        col("train"), col("lang"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getInt(5)))).toMap
    assert(out(1L) === ((3L, 2L, "en", 666666L, 1)))
    assert(out(2L) === ((1L, 1L, "fr", 1000000L, 0)))
    // NULL page: a zeroed row, never a lost document
    assert(out(3L) === ((0L, 0L, "", 0L, 0)))
  }

  test("x_lang_seg: planted foreign paragraphs fire the mixed flag") {
    val out = ops.CurateQueries.langSegQ(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(out.count() === docs.count(), "one visible row per document")
    val langs = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSet
    out.collect().foreach { r =>
      assert(r.getLong(1) >= 1L) // every fixture page has >= 1 paragraph
      assert(langs.contains(r.getString(3)))
      assert(r.getInt(5) === (if (r.getLong(2) >= 2) 1 else 0))
      assert(r.getLong(4) >= 1000000L / r.getLong(1) &&
        r.getLong(4) <= 1000000L)
    }
  }

  test("x_nb_langid: one prediction per doc from the label set") {
    val docs = Tables.documents(spark, sf)
    val labels = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSet
    val out = ops.CurateQueries.nbLangId(spark, sf).collect()
    assert(out.length === docs.filter(length(trim(col("text"))) > 0).count())
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    out.foreach { r =>
      assert(labels.contains(r.getString(2)))
      assert(r.getInt(3) === (if (r.getString(1) == r.getString(2)) 1 else 0))
    }
  }

  test("datasetSplit partitions the corpus exhaustively and deterministically") {
    val docs = Tables.documents(spark, sf)
    val m = ops.CurateQueries.datasetSplit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(m.keySet === Set("train", "val", "test"))
    // exhaustive: split sizes sum to the corpus
    assert(m.values.map(_._1).sum === docs.count())
    // train dominates (98% nominal; small-sample slack)
    assert(m("train")._1 > m("val")._1 * 10)
    // deterministic: a second run replays every digest bit-for-bit
    val again = ops.CurateQueries.datasetSplit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(again === m)
  }

  test("splitLeakage: class-keyed split never straddles, doc-keyed counted") {
    import spark.implicits._
    // 5 planted duplicate classes of 4 byte-identical docs each (same
    // text -> same full MinHash signature -> same class key) plus 10
    // singletons; texts are >= 3 tokens so every doc signs
    val docs = (0 until 20).map { i =>
      (i.toLong, s"dup class ${i % 5} payload words here")
    } ++ (100 until 110).map { i => (i.toLong, s"unique text $i with filler") }
    val df = docs.toDF("doc_id", "text")
    val r = GraftOps.splitLeakage(df, col("doc_id"), col("text")).head
    val (multi, sdkDoc, sdkClass) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(multi === 5L, "exactly the 5 planted duplicate classes")
    assert(sdkClass === 0L,
      "class-keyed assignment must co-assign every class member")
    assert(sdkDoc >= 0L && sdkDoc <= 5L)
    // determinism: a rerun replays the same counts
    val again = GraftOps.splitLeakage(df, col("doc_id"), col("text")).head
    assert((again.getLong(0), again.getLong(1), again.getLong(2)) ===
      ((multi, sdkDoc, sdkClass)))
  }

  test("stripHtml: blocks dropped, tags stripped, entities decoded in order") {
    import spark.implicits._
    import graft.functions.TextFns
    val cases = Seq(
      // script/style contents vanish, even with markup inside
      (1L, "<p>keep</p><script>drop <b>this</b></script><style>p{}</style>"),
      // entity order: &amp;lt; is a LITERAL "&lt;", never double-decoded
      (2L, "A &amp; B &lt;ok&gt; &quot;q&quot; &#39;s&#39; literal &amp;lt;"),
      // comments with markup inside; whitespace collapses; malformed
      // stray '<' without a closing '>' survives as text (no DOM error)
      (3L, "x  <!-- <i>gone</i> -->  y < z"),
      (4L, ""),
      // tag names are case-insensitive in HTML: an uppercase block must
      // drop its CONTENTS, not just its tags
      (5L, "<SCRIPT>var leak = 1;</SCRIPT><Style>.y{}</Style>ok")
    ).toDF("id", "h")
    val out = cases.select(col("id"), TextFns.stripHtml(col("h")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "keep")
    assert(out(2L) === "A & B <ok> \"q\" 's' literal &lt;")
    assert(out(3L) === "x y < z")
    assert(out(4L) === "")
    assert(out(5L) === "ok", "uppercase script/style contents must drop")
  }

  test("zipfFit recovers an exact power law: slope -1, R² = 1") {
    import spark.implicits._
    // tf(r) = 12/r for ranks 1..3 (12, 6, 4) is EXACTLY Zipf with
    // exponent 1: ln(tf) = ln 12 - ln(rank), so the least-squares fit
    // must return slope -1 and a perfect R² (both exact after round 6)
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c")
    val docs = Seq(("S", words.mkString(" "))).toDF("source", "text")
    val r = GraftOps.zipfFit(docs, col("source"), col("text")).head
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === -1.0, s"slope ${r.getDouble(2)}")
    assert(r.getDouble(3) === 1.0, s"r2 ${r.getDouble(3)}")
  }

  test("heapsFit recovers an exact growth law; equal-size groups give null") {
    import spark.implicits._
    // (tokens, distinct) = (4,2), (16,4), (64,8): ln(distinct) is
    // exactly 0.5·ln(tokens), so beta must be 0.5 after round 6
    def doc(n: Int, d: Int): String =
      (0 until n).map(i => "t" + (i % d)).mkString(" ")
    val docs = Seq(("S", doc(4, 2)), ("S", doc(16, 4)), ("S", doc(64, 8)),
      ("E", doc(8, 3)), ("E", doc(8, 5))) // E: no size variation
      .toDF("source", "text")
    val out = GraftOps.heapsFit(docs, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(out("S") === ((3L, Some(0.5))))
    assert(out("E") === ((2L, None)),
      "a group with no token-count variation has no defined slope")
  }

  test("klDrift matches the hand formula; identical distribution gives 0") {
    import spark.implicits._
    // src A tokens {a:2, b:1}, src B {a:1, b:2}; corpus {a:3, b:3}:
    // KL(A) = (2/3)ln(4/3) + (1/3)ln(2/3) = 0.056633 (and B symmetric)
    val docs = Seq(("A", "a a b"), ("B", "b b a")).toDF("source", "text")
    val out = GraftOps.klDrift(docs, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("A") === ((3L, 2L, 0.056633)))
    assert(out("B") === ((3L, 2L, 0.056633)))
    // a single source IS the corpus: divergence exactly 0
    val one = Seq(("S", "x y z y")).toDF("source", "text")
    val kl0 = GraftOps.klDrift(one, col("source"), col("text")).head.getDouble(3)
    assert(kl0 === 0.0)
  }

  test("perplexityKneserNey matches the textbook formula by hand") {
    import spark.implicits._
    // corpus: "a b", "a b", "a c" -> C(ab)=2, C(ac)=1; C(a·)=3,
    // N1+(a·)=2; N1+(·b)=N1+(·c)=1; N1+(··)=2. With D=0.75:
    //   p(b|a) = 1.25/3 + (0.75·2/3)·(1/2) = 2/3   -> ppl("a b") = 1.5
    //   p(c|a) = 0.25/3 + (0.75·2/3)·(1/2) = 1/3   -> ppl("a c") = 3.0
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = GraftOps.perplexityKneserNey(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) === 1.5 && out(2L) === 1.5)
    assert(out(3L) === 3.0)
  }

  test("perplexityKneserNey: observed-type mass never exceeds 1 per context") {
    // Σ_b p(b|a) over OBSERVED followers plus the unseen continuation
    // mass equals 1 exactly in KN; the observed part alone must be <= 1.
    // Reconstruct per-pair probabilities from per-doc nll on 1-pair docs.
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "y z"),
      (5L, "z x")).toDF("doc_id", "text")
    val out = GraftOps.perplexityKneserNey(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> math.exp(-r.getDouble(2))).toMap
    // context x: followers y (docs 1,2 same pair) and z
    val massX = out(1L) + out(3L)
    assert(massX > 0.0 && massX <= 1.0 + 1e-9, s"mass(x·) = $massX")
    assert(out.values.forall(p => p > 0.0 && p < 1.0))
  }

  test("bpeTrain replays a plain-Scala greedy BPE on the fixture corpus") {
    val texts = Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    texts.foreach(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .foreach(w => freq(w) += 1))
    var syms: Map[String, Vector[String]] =
      freq.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val expected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to 4) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      syms.foreach { case (w, s) =>
        s.sliding(2).filter(_.size == 2)
          .foreach(p => pc((p(0), p(1))) += freq(w))
      }
      val ((a, b), c) = pc.toSeq.minBy { case ((l, rr), n) => (-n, l, rr) }
      expected += ((r.toLong, a, b, c))
      // greedy left-to-right merge, the exact `replace` contract
      syms = syms.map { case (w, s) =>
        val out = Vector.newBuilder[String]; var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += s(i); i += 1 }
        }
        w -> out.result()
      }
    }
    val got = GraftOps.bpeTrain(Tables.documents(spark, sf), col("text"),
        rounds = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got === expected.toSeq)
  }

  test("bpeTrain chains merged symbols into later rounds") {
    import spark.implicits._
    val df = Seq("aaaa aaaa aaaa", "ab ab").toDF("text")
    val m = GraftOps.bpeTrain(df, col("text"), rounds = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // "aaaa"×3: (a,a) appears 3×3=9 times; after the merge the word is
    // [aa, aa] so round 2's winner is the MERGED pair (aa, aa)
    assert(m(0) === ((1L, "a", "a", 9L)))
    assert(m(1) === ((2L, "aa", "aa", 3L)))
    assert(m(2) === ((3L, "a", "b", 2L)))
  }

  test("bpeTrain fails loudly when a token carries a delimiter char") {
    import spark.implicits._
    // '<' inside a token would corrupt symbol parsing silently and
    // identically in both engines — the guard must reject it up front
    val df = Seq("normal words here", "a <tag> sneaks in").toDF("text")
    val e = intercept[IllegalArgumentException] {
      GraftOps.bpeTrain(df, col("text"), rounds = 2)
    }
    assert(e.getMessage.contains("delimiter"))
  }

  test("bpeApply folds merges greedily left-to-right, word-bounded") {
    import spark.implicits._
    val df = Seq((1L, "aaa ab"), (2L, "")).toDF("doc_id", "text")
    // (a,a) then (aa,a): "aaa" -> [aa, a] -> [aaa] (1 token); "ab" is
    // untouched (no merge crosses the space) -> 2 tokens
    val out = GraftOps.bpeApply(df, col("doc_id"), col("text"),
        Seq(("a", "a"), ("aa", "a")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(1L) === 3L)
    assert(out(2L) === 0L)
  }

  test("ngramNovelty: first occurrence is novel, repeats are not, " +
    "in-doc repeats of a first occurrence stay novel") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d"),      // grams "a b c","b c d" — both novel
      (1L, "a b c"),        // "a b c" first seen in doc 0 — not novel
      (2L, "x y z x y z"),  // 4 grams, all first seen here — all novel
      (3L, "x y z")         // not novel
    ).toDF("doc_id", "text")
    val out = GraftOps.ngramNovelty(docs, col("doc_id"), col("text"),
        buckets = 2)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // bucket 0 = docs {0,1}: 3 occurrences, doc 0's 2 are novel
    // bucket 1 = docs {2,3}: 5 occurrences, doc 2's 4 are novel (the
    // duplicated "x y z" inside doc 2 counts novel BOTH times — first
    // seen HERE is a per-gram-per-doc fact)
    assert(out === Seq(
      (0L, 2L, 3L, 2L, 666666L),
      (1L, 2L, 5L, 4L, 800000L)))
  }

  test("embedHealth: norms, raw centroid norm, and mean cosine by hand") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(3f, 4f), "a"), (2L, Seq(3f, 4f), "a"),
      (3L, Seq(1f, 0f), "b"), (4L, Seq(0f, 1f), "b")
    ).toDF("vec_id", "embedding", "label")
    val out = GraftOps.embedHealth(emb, col("vec_id"), col("embedding"),
        col("label"))
      .orderBy("label").collect()
    // label a: both vectors (3,4): norm 5, centroid (3,4), cos 1
    assert(out(0).getLong(1) === 2L && out(0).getInt(2) === 2)
    assert(out(0).getDouble(3) === 5.0 && out(0).getDouble(4) === 5.0)
    assert(out(0).getDouble(5) === 5.0 && out(0).getDouble(6) === 1.0)
    // label b: unit axes, centroid (0.5, 0.5): norm sqrt(.5), cos sqrt(.5)
    assert(out(1).getDouble(3) === 1.0 && out(1).getDouble(4) === 1.0)
    assert(out(1).getDouble(5) === 0.707107)
    assert(out(1).getDouble(6) === 0.707107)
  }

  test("anchorIndex: extraction, canonical collapse, NULL group, " +
      "modal term by hand") {
    import spark.implicits._
    val pages = Seq(
      // two spellings of ONE target + an href-less tag to skip
      (1L, "<p>x</p><a href=\"https://a.com/p\">nice page</a>" +
        "<a class=\"z\">skip me</a>" +
        "<a href=\"HTTPS://A.COM:443/p?utm_source=f\">nice read</a>"),
      // same target from a second doc + a relative href (NULL group)
      (2L, "<a href=\"https://a.com/p#frag\">other page</a>" +
        "<a href=\"/rel\">here now</a>"),
      // a page with no anchors at all contributes nothing
      (3L, "<p>plain</p>")
    ).toDF("doc_id", "page")
    val out = GraftOps.anchorIndex(pages, col("doc_id"), col("page"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(out.length === 2)
    // NULL group: doc 2's relative href, tokens "here now" -> modal
    // 'now' (1-1 tie, lexicographically LAST wins)
    assert(out(0) === ((None, 1L, 1L, 2L, "now")))
    // https://a.com/p: 3 links from 2 docs, 6 anchor tokens; term
    // counts page:2 nice:2 other:1 read:1 -> tie page/nice -> 'page'
    assert(out(1) === ((Some("https://a.com/p"), 3L, 2L, 6L, "page")))
  }

  test("parseSitemap: loc canonicalized, optional fields verbatim, " +
      "loc-less block visible") {
    import spark.implicits._
    val xml = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>https://a.com/x?utm_source=f</loc>" +
      "<lastmod>2024-03-01</lastmod></url>" +
      "<url><loc>HTTPS://A.COM:443/y</loc>" +
      "<priority>0.9</priority></url>" +
      "<url><lastmod>2024-01-01</lastmod></url>" +
      "</urlset>"
    val out = GraftOps.parseSitemap(
        Seq(("h1", xml)).toDF("host", "x"), col("host"), col("x"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).sortBy(_._2)
    assert(out === Seq(
      ("h1", "", "2024-01-01", ""), // spec-invalid loc-less block: visible
      ("h1", "https://a.com/x", "2024-03-01", ""), // utm stripped
      ("h1", "https://a.com/y", "", "0.9"))) // case + :443 folded
    // a sitemap with no <url> blocks contributes zero rows, not a crash
    assert(GraftOps.parseSitemap(Seq(("h2", "<urlset></urlset>"))
      .toDF("host", "x"), col("host"), col("x")).count() === 0L)
  }

  test("resolveRedirects: exact hops, terminals, cycles, dangling and " +
      "over-cap chains; duplicate sources are loud") {
    import spark.implicits._
    val edges = Seq(
      ("a", Some("b")), ("b", Some("c")), ("c", None), // chain a->b->c
      ("d", Some("e")), ("e", Some("d")),              // 2-cycle
      ("f", Some("g")),                                // dangling target
      ("h", Some("h"))                                 // self-loop
    ).toDF("u", "nxt")
    val out = GraftOps.resolveRedirects(edges, col("u"), col("nxt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).sortBy(_._1)
    assert(out === Seq(
      ("a", "c", 2L, 1), ("b", "c", 1L, 1), ("c", "c", 0L, 1),
      ("d", "", 0L, 0), ("e", "", 0L, 0),
      ("f", "", 0L, 0), ("h", "", 0L, 0)))
    // a chain longer than maxHops stays visibly unresolved
    val chain = (0 to 9).map(i =>
      (s"u$i", if (i == 9) None else Some(s"u${i + 1}")))
      .toDF("u", "nxt")
    val capped = GraftOps.resolveRedirects(chain, col("u"), col("nxt"),
        maxHops = 4)
      .collect().map(r => (r.getString(0), r.getInt(3))).toMap
    assert(capped("u0") === 0 && capped("u6") === 1 && capped("u9") === 1)
    // two next values for one URL: not a function -> loud
    val dup = Seq(("a", Some("b")), ("a", Some("c")), ("b", None),
      ("c", None)).toDF("u", "nxt")
    val e = intercept[IllegalArgumentException] {
      GraftOps.resolveRedirects(dup, col("u"), col("nxt"))
    }
    assert(e.getMessage.contains("duplicate source URL"))
  }
}
