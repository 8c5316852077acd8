package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** The native minhash_sig / simhash60 expressions must be BIT-IDENTICAL
  * to the composed built-in forms they replace (the exploded tall
  * md5+conv derivations the DuckDB oracles still replay), null-safe, and
  * usable from plain SQL via the GraftExtensions registration.
  */
class TextSigsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).limit(200)

  test("minhash_sig equals the exploded tall-form signature bit-for-bit") {
    val perms = 16
    val sh = GraftOps.shingleTable(docs, col("doc_id"), col("text"))
    // the pre-expression derivation: explode, one md5/conv per shingle,
    // then perms codegen'd min aggregates
    val tall = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"),
        conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("hv"))
    val sigCols = (0 until perms).map(p =>
      min(col("hv") * (2 * p + 1) % (1L << 42)).as(s"s$p"))
    val expected = tall.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        array((0 until perms).map(p => col(s"s$p")): _*).as("sig"))
    val native = sh.select(col("doc_id"),
      expr(s"minhash_sig(shingles, $perms)").as("sig"))
    assert(native.join(expected, "doc_id")
      .filter(native("sig") =!= expected("sig")).count() === 0)
    assert(native.count() === expected.count())
  }

  test("simhash60 equals the aggregated tf-weighted fingerprint bit-for-bit") {
    import graft.functions.TextFns
    val bits = 60
    val toks = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
    val tall = toks.select(col("doc_id"), explode(col("w")).as("t"))
      .select(col("doc_id"),
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("h"))
    val sums = (0 until bits).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L))).as(s"b$i")) :+
      count(lit(1)).as("n")
    val expected = tall.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(i =>
          when(col(s"b$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
    val native = toks.select(col("doc_id"), expr("simhash60(w)").as("fp"))
      .filter(col("fp").isNotNull)
    assert(native.join(expected, "doc_id")
      .filter(native("fp") =!= expected("fp")).count() === 0)
    // the exploded form drops zero-token docs; the null filter above
    // must leave exactly the same doc set
    assert(native.count() === expected.count())
  }

  test("gram_md5 equals the exploded gramsN+md5 derivation bit-for-bit") {
    import graft.functions.TextFns
    val n = 16
    val toks = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= n)
    val expected = toks.select(col("doc_id"),
        explode(TextFns.gramsN(col("w"), n)).as("g"))
      .select(col("doc_id"), md5(col("g")).as("h"))
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("h"))).as("hs"))
    val native = toks.select(col("doc_id"),
        explode(expr(s"gram_md5(w, $n)")).as("h"))
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("h"))).as("hs"))
    assert(native.join(expected, "doc_id")
      .filter(native("hs") =!= expected("hs")).count() === 0)
    assert(native.count() === expected.count())
  }

  test("gram_occ equals the composed transform+slice+filter derivation bit-for-bit") {
    val q = 4
    val names = docs.select(col("doc_id"),
        substring(col("text"), 1, 60).as("s"))
      .filter(length(col("s")) >= q)
    val expected = names.select(col("doc_id"),
        expr(s"transform(sequence(1, length(s) - $q + 1), " +
          s"i -> substring(s, i, $q))").as("ga"))
      .select(col("doc_id"), explode(expr(
        "transform(ga, (g, i) -> struct(g AS gram, " +
          "size(filter(slice(ga, 1, i), x -> x = g)) + 1 AS occ))")).as("go"))
      .select(col("doc_id"), col("go.gram").as("gram"), col("go.occ").as("occ"))
    val native = names.select(col("doc_id"),
        explode(expr(s"gram_occ(s, $q)")).as("go"))
      .select(col("doc_id"), col("go.gram").as("gram"), col("go.occ").as("occ"))
    assert(native.exceptAll(expected).isEmpty
        && expected.exceptAll(native).isEmpty,
      "native gram_occ diverged from the composed lambda derivation")
    // shorter-than-q strings yield an empty array (no rows)
    import spark.implicits._
    val short = Seq((1L, "abc")).toDF("id", "s")
      .select(col("id"), explode(expr("gram_occ(s, 4)")))
    assert(short.count() === 0)
  }

  test("n=1 behavior: unigram path pinned (no gramsN counterpart exists)") {
    // The SQL surface accepts n/q = 1 while the composed Scala form
    // (TextFns.gramsN) starts at n = 2, so the unigram case has no
    // bit-parity twin — pin its behavior directly: windows of one token
    // hash the token, single-char q-grams index the characters.
    import spark.implicits._
    val df = Seq((1L, Seq("ab", "cd", "ab"))).toDF("id", "arr")
    val md5s = df.select(expr("gram_md5(arr, 1)").as("hs"))
      .select(explode(col("hs")).as("h")).collect().map(_.getString(0))
    val direct = df.select(explode(col("arr")).as("t"))
      .select(md5(col("t"))).collect().map(_.getString(0))
    assert(md5s.toSeq === direct.toSeq,
      "gram_md5(w, 1) must hash each token in order")
    // gram_stats(w, 1): tot = token count, top/dup over token counts
    val st = df.select(expr("gram_stats(arr, 1)").as("s"))
      .select(col("s.tot"), col("s.top"), col("s.dup")).head
    assert((st.getLong(0), st.getLong(1), st.getLong(2)) === ((3L, 2L, 2L)))
    // gram_occ(s, 1): one struct per character with occurrence numbering
    val occ = Seq((1L, "aba")).toDF("id", "s")
      .select(explode(expr("gram_occ(s, 1)")).as("go"))
      .select(col("go.gram"), col("go.occ"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(occ.toSeq === Seq(("a", 1), ("b", 1), ("a", 2)))
  }

  test("gram_md5 drops null-bearing windows and shorter-than-n arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),     // 3 full windows of 2
      (2L, Seq("a", null, "c")),         // both windows touch the null
      (3L, Seq("solo"))                  // shorter than n -> empty
    ).toDF("id", "arr")
    val out = df.select(col("id"), expr("gram_md5(arr, 2)").as("hs"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).length)).toMap
    assert(out === Map(1L -> 3, 2L -> 0, 3L -> 0))
  }

  test("gram_stats equals the exploded groupBy derivation exactly") {
    import graft.functions.TextFns
    val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
    val expected = base
      .select(col("doc_id"), explode(TextFns.grams2(col("w"))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("tot"), max(col("c")).as("top"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup"))
    val native = base.select(col("doc_id"),
        call_function("gram_stats", col("w"), lit(2)).as("s"))
      .select(col("doc_id"), col("s.tot").as("tot"),
        col("s.top").as("top"), col("s.dup").as("dup"))
    assert(native.count() === expected.count())
    assert(native.join(expected, "doc_id")
      .filter(native("tot") =!= expected("tot") ||
        native("top") =!= expected("top") ||
        native("dup") =!= expected("dup")).count() === 0)
  }

  test("winnow_sels equals the exploded window-min derivation bit-for-bit") {
    import graft.functions.TextFns
    import org.apache.spark.sql.expressions.Window
    val (gramN, window) = (3, 4)
    val posCap = 1L << 20
    // the pre-expression pipeline: posexplode grams, pack (hash, pos),
    // doc-partitioned sliding min, distinct + sort
    val tall = docs.select(col("doc_id"),
        posexplode(TextFns.gramsN(TextFns.tokens(col("text")), gramN))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
          * posCap + (lit(posCap - 1) - col("pos"))).as("key"))
    val wSel = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    val wDoc = Window.partitionBy(col("doc_id"))
    val expected = tall.select(col("doc_id"),
        min(col("key")).over(wSel).as("sel"),
        count(lit(1)).over(wDoc).as("n_grams"))
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(array_sort(collect_set(col("sel"))).as("sels"))
    val native = docs.select(col("doc_id"),
        call_function("winnow_sels",
          TextFns.tokens(col("text")), lit(gramN), lit(window)).as("wn"))
      .filter(col("wn").isNotNull)
      .select(col("doc_id"), col("wn.n_grams").as("n_grams"),
        col("wn.sels").as("sels"))
    assert(native.count() === expected.count())
    assert(native.join(expected, "doc_id")
      .filter(native("sels") =!= expected("sels") ||
        native("n_grams") =!= expected("n_grams")).count() === 0)
  }

  test("empty and all-NULL arrays yield NULL, not a bogus signature") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq[String](null)),
      (3L, Seq("a b c", null))
    ).toDF("id", "arr")
    val out = df.select(col("id"),
      expr("minhash_sig(arr, 4)").as("sig"), expr("simhash60(arr)").as("fp"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2))).toSet
    // ids 1-2 have no hashable element -> NULL; id 3 skips the null
    // element but signs the valid one
    assert(out === Set((1L, true, true), (2L, true, true), (3L, false, false)))
  }

  test("minhash_sig rejects out-of-contract perms loudly") {
    import spark.implicits._
    val df = Seq(Seq("x")).toDF("arr")
    val e = intercept[Exception] {
      df.select(expr("minhash_sig(arr, 21)")).collect()
    }
    assert(e.getMessage.contains("perms") ||
      Option(e.getCause).exists(_.getMessage.contains("perms")))
  }

  test("both are registered for plain SQL") {
    docs.createOrReplaceTempView("docs_sig_sql")
    val n = spark.sql(
      """SELECT doc_id, minhash_sig(split(text, ' '), 8) sig,
        |       simhash60(split(text, ' ')) fp
        |FROM docs_sig_sql LIMIT 5""".stripMargin).count()
    assert(n === 5)
  }
}
