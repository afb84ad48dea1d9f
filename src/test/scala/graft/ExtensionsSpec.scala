package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, md5, substring, unix_micros}

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions function set is SQL-callable once installed") {
    // getOrCreate would reuse the shared suite session and silently drop
    // .withExtensions, so drive the same function tuples via install()
    val s: SparkSession = spark
    GraftExtensions.install(s)
    val h = s.sql("SELECT rolling_hash('hello world') AS h").head().getLong(0)
    val ref = "hello world".getBytes("UTF-8")
      .foldLeft(0L)((acc, b) => (acc * 131 + (b & 0xff)) % 1000000007L)
    assert(h == ref)
    val d = s.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
    // short input (< k): the whole text collapses to one rolling-hash entry
    val fps = s.sql("SELECT winnow_fingerprints('tiny', 8, 8) AS f")
      .head().getSeq[Long](0)
    val tiny = "tiny".getBytes("UTF-8")
      .foldLeft(0L)((acc, b) => (acc * 131 + (b & 0xff)) % 1000000007L)
    assert(fps == Seq(tiny))
    // cms_estimate: build a tiny sketch driver-side, probe it in SQL —
    // counts of present keys are >= truth (CMS never underestimates)
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 1)
    Seq(5L, 5L, 5L, 9L).foreach(k => cms.add(Long.box(k)))
    val bos = new java.io.ByteArrayOutputStream(); cms.writeTo(bos)
    val hex = bos.toByteArray.map("%02x".format(_)).mkString
    val est = s.sql(
      s"SELECT cms_estimate(unhex('$hex'), 5L) AS e").head().getLong(0)
    assert(est >= 3L, s"cms_estimate of a 3-count key returned $est")
  }

  test("token_set_count matches the interpreted filter HOF and is SQL-callable") {
    import org.apache.spark.sql.functions._
    val sw = graft.ext.TextAnalysis.stopwords
    val toks = split(lower(trim(col("text"))), "\\s+")
    // run the equivalence scan with codegen fallback DISABLED: if
    // doGenCode ever emits uncompilable Java, this throws instead of
    // silently falling back to interpreted eval (which would leave the
    // "native codegen" claim unverified while every value still matched)
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val diff = graft.etl.Tables.table(spark, sf, "documents")
        .select(
          graft.functions.TokenSetCount.token_set_count(toks, sw).as("native"),
          size(filter(toks, t => t.isInCollection(sw))).cast("long").as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(diff == 0, "native expression must replicate the HOF exactly")
    } finally {
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
    GraftExtensions.install(spark)
    val n = spark.sql(
      "SELECT token_set_count(array('a','the','b','of'), array('the','of','a')) AS n")
      .head().getLong(0)
    assert(n == 3)
  }

  test("repetition signals: exact fractions on hand-checked docs") {
    val sess = spark
    import sess.implicits._
    val got = graft.ext.TextAnalysis.repetitionSignals(
      Seq((1L, "a a a a"),          // 4 words, 1 distinct, bigram "a a" ×3
        (2L, "a b c d"),            // all distinct, 3 distinct bigrams
        (3L, "spark"))              // single token: degenerate bigram branch
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((4L, 0.75, 1.0, 1.0)))
    assert(got(2L) == ((4L, 0.0, 0.25, 1.0 / 3.0)))
    assert(got(3L) == ((1L, 0.0, 1.0, 1.0)))
  }

  test("pii redaction: counts and masks on a hand-checked doc") {
    val sess = spark
    import sess.implicits._
    val got = graft.ext.TextAnalysis.piiRedact(
      Seq((1L, "mail a.b@x.co and +1-555-0042 via 192.168.0.1 end"),
        (2L, "nothing sensitive here"))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == ((1L, 1L, 1L, "mail <EMAIL> and <PHONE> via <IP> end")))
    assert(got(2L) == ((0L, 0L, 0L, "nothing sensitive here")))
  }

  test("chunk windows: boundaries, overlap and the short-doc branch") {
    val sess = spark
    import sess.implicits._
    val toks100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val rows = graft.ext.TextAnalysis.chunkWindows(
      Seq((1L, toks100), (2L, "a b c")).toDF("doc_id", "text"),
      window = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // 100 tokens, W=64, S=48 → starts 0 and 48: sizes 64 and 52,
    // 16-token overlap (chunk0 ends at t64, chunk1 starts at t49)
    assert(d1.map(c => (c._2, c._3)).toSeq == Seq((0L, 64L), (1L, 52L)))
    assert(d1(0)._4.endsWith(" t64") && d1(1)._4.startsWith("t49 "))
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
  }

  test("token budget selection keeps a quality-ranked prefix per language") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("c8_token_budget")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val all = graft.ext.TextAnalysis.withQuality(
      graft.etl.Tables.table(spark, sf, "documents")
        .select("doc_id", "lang", "text"))
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        col("quality_score"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    got.groupBy(_._1).foreach { case (lang, kept) =>
      // the selection is a PREFIX of the (quality desc, doc_id) ranking…
      val ranked = all.filter(_._1 == lang)
        .sortBy(d => (-d._4, d._2)).map(_._2)
      val keptIds = kept.map(_._2).toSet
      assert(ranked.take(kept.length).toSet == keptIds,
        s"$lang: kept set must be the top-ranked prefix")
      // …whose token total fits the budget, and is maximal (next doc
      // would overflow, or there is no next doc)
      val total = kept.map(_._3).sum
      assert(total <= 500L)
      assert(kept.map(_._5).max == total, "cum_tokens peaks at the total")
      ranked.drop(kept.length).headOption.foreach { next =>
        val nextTok = all.find(d => d._1 == lang && d._2 == next).get._3
        assert(total + nextTok > 500L, s"$lang: selection must be maximal")
      }
    }
  }

  test("sequence packing: offsets in range, contiguous token accounting") {
    val rows = SparkEntry.queries("c9_pack_sequences")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, seqId, off) =>
      assert(off >= 0 && off < 256); assert(seqId >= 0)
    }
    rows.groupBy(_._2).foreach { case (_, group) =>
      val inOrder = group.sortBy(_._1)
      // seq_id * budget + seq_offset reconstructs the exclusive cumsum,
      // so consecutive docs must advance by exactly the previous doc's
      // token count — no gaps, no overlap, monotone sequence ids
      inOrder.sliding(2).foreach {
        case Array((_, _, nPrev, sPrev, oPrev), (_, _, _, sNext, oNext)) =>
          assert(sNext >= sPrev)
          assert(sNext * 256 + oNext == sPrev * 256 + oPrev + nPrev)
        case _ => ()
      }
    }
  }

  test("quality bins: quartiles are balanced and ranked within language") {
    val rows = SparkEntry.queries("c10_quality_bins")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4 >= 1 && r._4 <= 4))
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val sizes = docs.groupBy(_._4).view.mapValues(_.size).values
      assert(sizes.max - sizes.min <= 1, s"$lang: ntile must balance")
      // every doc in a better bin ranks at or above every doc in a worse
      // one under the (quality desc, doc_id) total order
      val worstPerBin = docs.groupBy(_._4).view
        .mapValues(_.map(d => (-d._3, d._2)).max).toMap
      worstPerBin.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(b1, b2) =>
          val bestB2 = docs.filter(_._4 == b2).map(d => (-d._3, d._2)).min
          assert(Ordering[(Double, Long)].lteq(worstPerBin(b1), bestB2),
            s"$lang: bin $b1 must outrank bin $b2")
        case _ => ()
      }
    }
  }

  test("stratified sample takes exactly k per language, layout-independent") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("c11_stratified_sample")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0)))
    assert(got.nonEmpty)
    val strata = graft.etl.Tables.table(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_._1).foreach { case (lang, docs) =>
      assert(docs.length == math.min(20L, strata(lang)),
        s"$lang: expected exactly min(k, stratum size)")
    }
    // hash-rank selection must not depend on the physical layout: rewrite
    // the corpus into a different file layout and re-run the SAME registry
    // query against it — identical ids must come back
    val tmp = java.nio.file.Files.createTempDirectory("graft_c11_")
    try {
      graft.etl.Tables.table(spark, sf, "documents")
        .repartition(13, col("source"))
        .write.parquet(s"$tmp/documents.parquet")
      val relaid = SparkEntry.queries("c11_stratified_sample")(spark, tmp.toString)
        .collect().map(_.getLong(0)).toSet
      assert(relaid == got.map(_._2).toSet,
        "selection changed with the physical layout")
    } finally {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.walk(tmp)
      try {
        st.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally st.close()
    }
  }

  test("c10b cutoff bins: no window in the plan; agrees with exact ntile off ties") {
    val exact = SparkEntry.queries("c10_quality_bins")(spark, sf)
    val cutoff = SparkEntry.queries("c10b_quality_bins_cutoffs")(spark, sf)
    val e = exact.collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    val c = cutoff.collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    // the production path must carry NO per-stratum sort: zero Window
    // operators anywhere in the physical plan (the presentation sort and
    // the tiny cutoff aggregate are the only orderings allowed). AQE wraps
    // the plan in AdaptiveSparkPlanExec — a LeafExecNode, so a structural
    // collect{case WindowExec} never descends into it and passes vacuously
    // (the r8 advice finding). Match the RENDERED plan instead: toString
    // recurses through the adaptive node, and asserting AFTER the collect
    // above pins the FINAL (isFinalPlan=true) physical plan, not the
    // initial guess. "Window" as a substring covers both WindowExec and
    // WindowGroupLimitExec; no column or expression in this query contains
    // the word.
    // positive control pinning the checker itself: c10's exact ntile DOES
    // plan a Window, and the rendered string must show it — if this ever
    // fails, the no-Window assertion below has gone blind (as the r8
    // structural collect had), not c10 windowless
    assert(exact.queryExecution.executedPlan.toString.contains("Window"),
      "checker blind: c10's ntile window invisible in the rendered plan")
    val planStr = cutoff.queryExecution.executedPlan.toString
    assert(!planStr.contains("Window"), s"c10b must not plan a Window:\n$planStr")
    assert(e.keySet == c.keySet)
    // cutoff binning assigns equal scores to equal bins; ntile splits tied
    // boundary scores across bins by doc_id — so the two may differ only
    // at ties, which are rare on a continuous score. Pin strong agreement
    // and identical bin semantics (1 = best).
    val agree = e.keys.count(k => e(k) == c(k)).toDouble / e.size
    assert(agree >= 0.9, s"c10/c10b agreement $agree below 0.9")
    assert(c.values.toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
  }

  test("c11b topk sample: no window in the plan; row-identical to exact c11") {
    val exact = SparkEntry.queries("c11_stratified_sample")(spark, sf)
    val topk = SparkEntry.queries("c11b_stratified_sample_topk")(spark, sf)
    // unlike c10b's tie-tolerant agreement, the selection here is EXACT:
    // (hash, doc_id) is a total order, so aggregator ≡ rank window row
    // for row, rank included
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(rows(topk) == rows(exact), "c11b selection differs from c11")
    // the production path must carry NO per-stratum rank: zero Window /
    // WindowGroupLimit operators anywhere in the physical plan — the
    // k-bounded aggregator and the presentation sort are the only
    // orderings allowed. String-match the rendered plan AFTER execution
    // (same rationale as c10b above: a structural collect stops at the
    // AdaptiveSparkPlanExec leaf and would pass vacuously; toString
    // recurses, and post-collect it renders the final adaptive plan).
    // positive control (see c10b): c11's rank window must be visible in
    // the rendered plan, or the no-Window check below proves nothing
    assert(exact.queryExecution.executedPlan.toString.contains("Window"),
      "checker blind: c11's rank window invisible in the rendered plan")
    val planStr = topk.queryExecution.executedPlan.toString
    assert(!planStr.contains("Window"), s"c11b must not plan a Window:\n$planStr")
  }

  test("t16b hot-split: row-identical to t16; hot slice broadcasts BY HINT, cold slice shuffles") {
    // threshold -1 removes size-based broadcast luck: the hot slice must
    // broadcast because the plan SAYS so (the explicit hint), and the
    // cold slice must keep the shuffled equi-join — at fixture scale the
    // default threshold would happily broadcast both and prove nothing
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plain = SparkEntry.queries("t16_bigram_commonness")(s, sf)
    val split = SparkEntry.queries("t16b_bigram_hotsplit")(s, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(rows(split) == rows(plain), "hot-split result differs from t16")
    // post-collect rendered plan = the final adaptive plan (c10b device)
    val planStr = split.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin"),
      s"hot slice did not broadcast:\n${planStr.take(2000)}")
    assert(planStr.contains("SortMergeJoin") || planStr.contains("ShuffledHashJoin"),
      s"cold slice lost its shuffled equi-join:\n${planStr.take(2000)}")
  }

  test("t16b cold path: AQE skew-split backstops a hot key left in the cold slice") {
    import org.apache.spark.sql.functions._
    // the twin's safety net, demonstrated: if the threshold misjudges and
    // a genuinely hot bigram lands in the COLD slice, AQE's runtime skew
    // split (same tuned-down thresholds as PlanSpec's generic proof) must
    // still carve the oversized partition — the plan degrades to slower,
    // never to melted-reducer
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // 95% of docs share the "alpha beta" bigram (one hot join key); the
    // rest spread over "gamma_k delta" cold keys. hotMinCf above every
    // count forces EVERYTHING cold — the misjudged-threshold case.
    // doc_ids are scrambled through xxhash64 (deterministic, 8 high-
    // entropy bytes/row; a collision among 20k draws from 2^64 is
    // ~2e-12): AQE measures COMPRESSED map-output sizes, and sequential
    // ids beside a constant bigram compress past any threshold (the
    // PlanSpec md5-pad lesson)
    val docs = s.range(0, 20000L).select(
      xxhash64(col("id")).as("doc_id"),
      when(col("id") % 20 < 19, lit("alpha beta"))
        .otherwise(concat(lit("gamma_"), (col("id") % 50).cast("string"),
          lit(" delta"))).as("text"))
    val out = ExtensionQueries.bigramCommonnessHotSplit(docs, hotMinCf = 1000000L)
    val res = out.collect()
    // analytic oracle: every doc has exactly ONE bigram — "alpha beta"
    // (cf 19000) for the hot 95%, "gamma_k delta" (cf 200: 1000 cold
    // docs over the 5 residues id%50 can take when id%20 = 19) else
    assert(res.length == 20000)
    assert(res.forall(r => r.getLong(1) == 1L &&
      (r.getLong(2) == 19000L || r.getLong(2) == 200L) &&
      r.getDouble(3) == r.getLong(2).toDouble), "skew-split changed the result")
    assert(res.count(_.getLong(2) == 19000L) == 19000)
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("isFinalPlan=true"), "adaptive plan never finalized")
    assert(planStr.contains("skew=true"),
      s"AQE did not mark the skewed cold join:\n${planStr.take(2000)}")
  }

  test("l2 normalize emits unit vectors; zero vectors go to NULL not NaN") {
    val rows = SparkEntry.queries("v3_l2_normalize")(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, v) => !v.exists(_.isNaN) })
    rows.groupBy(_._1).foreach { case (id, comps) =>
      val vals = comps.flatMap(_._2)
      if (vals.nonEmpty) {
        val norm = math.sqrt(vals.map(x => x * x).sum)
        assert(math.abs(norm - 1.0) < 1e-9, s"vec $id norm $norm")
      }
    }
  }

  test("incremental dedup drops exactly the re-ingested fingerprints") {
    val rows = SparkEntry.queries("d7_incremental_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty)
    // every injected corpus copy (id ≥ 2,000,000) must be anti-joined away
    assert(!rows.exists(_._1 >= 2000000L),
      "re-ingested corpus copies must never survive the anti-join")
    // survivors are fingerprint-unique (within-batch dedup)
    assert(rows.map(_._2).distinct.length == rows.length)
  }

  test("patch grid: borders clamp and zero-area media yields zero patches") {
    val sess = spark
    import sess.implicits._
    val rows = graft.ext.Multimodal.patchGrid(
      Seq((1L, 33, 16), (2L, 0, 64)).toDF("doc_id", "width", "height"),
      patch = 16).collect()
    assert(!rows.exists(_.getLong(0) == 2L),
      "zero-area metadata must produce zero patches, not sequence(0,-1) phantoms")
    val d1 = rows.filter(_.getLong(0) == 1L)
    assert(d1.length == 3, "33x16 at patch 16 → 3x1 grid")
    // (px, pw): the border patch is clamped to the 1px remainder
    assert(d1.map(r => (r.getLong(2), r.getLong(6))).toSet ==
      Set((0L, 16L), (1L, 16L), (2L, 1L)))
  }

  test("domain mix sampling is partition-independent and near its rates") {
    import org.apache.spark.sql.functions.col
    val q = SparkEntry.queries("c4_domain_mix")
    val base = q(spark, sf).collect().map(_.getLong(0)).toSet
    // same decision regardless of physical layout (hash-gated, not rand())
    val repart = q(spark, sf).repartition(7).collect().map(_.getLong(0)).toSet
    assert(base == repart)
    // realized rates track the configured mixture (500 docs → loose bounds)
    val byLang = q(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.etl.Tables.table(spark, sf, "documents")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == totals("en"), "en is kept in full")
    val zhFrac = byLang.getOrElse("zh", 0L).toDouble / totals("zh")
    assert(zhFrac > 0.1 && zhFrac < 0.45, s"zh sampled at ~0.25, got $zhFrac")
    val deFrac = byLang.getOrElse("de", 0L).toDouble / totals("de")
    assert(deFrac > 0.3 && deFrac < 0.7, s"de sampled at ~0.5, got $deFrac")
  }

  test("winnowing guarantee: shared substring ≥ w+k−1 shares a fingerprint") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val fps = Seq(
      (1L, s"prefix one $common suffix alpha"),
      (2L, s"totally different lead-in $common and another tail"),
      (3L, "unrelated content with no overlap whatsoever in here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.WinnowFingerprints
        .winnow_fingerprints(col("text"), 8, 8).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1) intersect fps(2)).nonEmpty,
      "docs sharing a 59-char substring must share a fingerprint")
    assert((fps(1) intersect fps(3)).isEmpty,
      "unrelated docs should share nothing at this corpus size")
  }

  /** The b2/b3 fixture, replayed driver-side: the same md5-thinned events
    * the queries consume, as (user, type, micros) triples.
    */
  private def thinnedEvents(): Array[(Long, String, Long)] = {
    import org.apache.spark.sql.functions._
    graft.etl.Tables.events(spark, sf)
      .filter(substring(md5(col("event_id").cast("string")), 1, 1) === "0")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
  }

  test("funnel: stage counts match a per-user brute-force replay") {
    val rows = SparkEntry.queries("b2_funnel")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("signup", "click", "purchase"), "stage order is the funnel order")
    val got = rows.map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    // strict-ordering replay: first signup, first click at/after it,
    // first purchase at/after that click — per user, driver-side
    var n1, n2, n3 = 0L
    thinnedEvents().groupBy(_._1).foreach { case (_, evs) =>
      val s = evs.filter(_._2 == "signup").map(_._3).minOption
      val c = s.flatMap(t => evs.filter(e => e._2 == "click" && e._3 >= t)
        .map(_._3).minOption)
      val p = c.flatMap(t => evs.filter(e => e._2 == "purchase" && e._3 >= t)
        .map(_._3).minOption)
      if (s.isDefined) n1 += 1; if (c.isDefined) n2 += 1; if (p.isDefined) n3 += 1
    }
    assert(got == Map("signup" -> n1, "click" -> n2, "purchase" -> n3),
      s"funnel $got != replay ($n1, $n2, $n3)")
    assert(n1 > n2 && n2 > n3 && n2 > 0,
      s"fixture must discriminate stages, got $n1/$n2/$n3")
    val pcts = rows.map(_.getAs[Double]("pct_of_first"))
    assert(pcts.head == 1.0 && pcts.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("retention: offset 0 is the full cohort; cohorts partition the users") {
    val rows = SparkEntry.queries("b3_retention")(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"),
        r.getAs[Long]("cohort_size"), r.getAs[Double]("retention")))
    assert(rows.nonEmpty)
    rows.foreach { case (cw, off, nAct, cSize, ret) =>
      assert(nAct <= cSize, s"cohort $cw offset $off: active $nAct > size $cSize")
      assert(ret == nAct.toDouble / cSize)
      if (off == 0L) assert(nAct == cSize,
        s"offset 0 must be the whole cohort (every user's first event is there)")
    }
    // cohort sizes partition the thinned fixture's distinct users
    val users = thinnedEvents().map(_._1).distinct.length
    val sizes = rows.filter(_._2 == 0L).map(_._4).sum
    assert(sizes == users, s"cohort sizes $sizes != $users distinct users")
    assert(rows.map(_._1).distinct.length > 1,
      "fixture must yield more than one cohort week")
  }

  test("weighted sample: membership is exactly the integer md5 threshold rule") {
    val got = SparkEntry.queries("c14_weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def u6(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(6), 16)
    }
    val expected = graft.etl.Tables.table(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1), u6(r.getLong(0))))
      .filter { case (_, nc, u) => u * 400L < 16777216L * math.min(nc, 400L) }
      .sortBy(_._1).toSeq
    assert(got == expected, "sample differs from the JVM md5 replay")
    // weight semantics: a doc at/above the cap is sampled with certainty
    val full = expected.count(_._2 >= 400L)
    val fullAll = graft.etl.Tables.table(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("n_chars") >= 400L).count()
    assert(full.toLong == fullAll, "full-weight docs must always be kept")
    assert(got.nonEmpty && got.size < fullAll + expected.size,
      "sample must be a strict, non-empty subset overall")
  }

  test("filter verdict: per-rule flags match a scala replay of the rules") {
    val sw = graft.ext.TextAnalysis.stopwords.toSet
    val got = SparkEntry.queries("c15_filter_verdict")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    val docs = graft.etl.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
    assert(got.size == docs.length, "one verdict row per document")
    var nPass = 0
    docs.foreach { r =>
      val w = r.getString(1).trim.toLowerCase.split("\\s+").toSeq
      val n = w.size.toLong
      val sumChars = w.map(_.length.toLong).sum
      val nStop = w.count(sw.contains).toLong
      val maxTf = w.groupBy(identity).values.map(_.size).max.toLong
      val rLen = n >= 20 && n <= 90
      val rWl = 5 * sumChars >= 22 * n && 5 * sumChars <= 26 * n
      val rStop = nStop >= 2
      val rRep = 8 * maxTf <= n
      val passes = rLen && rWl && rStop && rRep
      if (passes) nPass += 1
      assert(got(r.getLong(0)) == ((n, rLen, rWl, rStop, rRep, passes)),
        s"doc ${r.getLong(0)}: ${got(r.getLong(0))} != ($n, $rLen, $rWl, $rStop, $rRep, $passes)")
    }
    assert(nPass > 0 && nPass < docs.length,
      s"thresholds must discriminate on the fixture ($nPass of ${docs.length} pass)")
  }

  test("t18 fluency: valid probability means; conditional signal diverges from t16") {
    // value semantics are oracle-pinned; this pins the PURPOSE — each
    // score is a mean of smoothed conditional probabilities (so strictly
    // inside (0,1)), and the conditional normalization must actually
    // reorder documents relative to t16's raw-frequency commonness
    // somewhere on the fixture, or the operator adds nothing over t16
    val t18 = SparkEntry.queries("t18_bigram_fluency")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val t16 = SparkEntry.queries("t16_bigram_commonness")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(t18.keySet == t16.keySet)
    t18.values.foreach(f => assert(f > 0.0 && f < 1.0, s"fluency $f not a probability mean"))
    val ids = t18.keys.toSeq.sorted
    val discordant = (for {
      i <- ids.indices.iterator; j <- ((i + 1) until ids.size).iterator
      a = ids(i); b = ids(j)
      if (t18(a) - t18(b)) * (t16(a) - t16(b)) < 0
    } yield 1).take(1).nonEmpty
    assert(discordant, "t18 ranks identically to t16 — conditional normalization vacuous")
  }

  test("segments: empty token array yields EMPTY segments (range(0) semantics), boundaries aligned") {
    import org.apache.spark.sql.functions._
    // the sequence(0,-1) hazard is unreachable through tokens() (split("")
    // gives [""]), so pin the guard on the helper directly: 0 tokens must
    // give 0 segments — not the two phantom segments a descending
    // sequence(0,-1) would fabricate — and 1/8/9/16 tokens must give the
    // aligned ceil(n/8) segmentation with in-order reassembly
    val rows = Seq(0, 1, 8, 9, 16).map(n => (n, (1 to n).map(i => s"t$i")))
    val df = spark.createDataFrame(rows).toDF("n", "w")
      .select(col("n"), graft.ext.TextAnalysis.segments(col("w")).as("segs"))
    val got = df.collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(got(0) == Seq.empty, s"empty input fabricated segments: ${got(0)}")
    for (n <- Seq(1, 8, 9, 16)) {
      val expected = (1 to n).map(i => s"t$i").grouped(8).map(_.mkString(" ")).toSeq
      assert(got(n) == expected, s"n=$n: ${got(n)} != $expected")
    }
  }

  test("boilerplate strip: exact scala replay, order preserved, non-vacuous") {
    // full driver-side replay of the c18 semantics (500 docs at test
    // scale): aligned 8-token segments, df >= 3 boilerplate set counted
    // over DISTINCT docs, in-order reassembly. Comparing the whole result
    // pins both the strip rule and the order-preservation claim the
    // broadcast-set rewrite is supposed to buy for free.
    val corpus = graft.etl.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def segs(text: String): Seq[String] =
      text.trim.toLowerCase.split("\\s+").toSeq
        .grouped(8).map(_.mkString(" ")).toSeq
    val df = scala.collection.mutable.Map.empty[String, Set[Long]]
    corpus.foreach { case (id, t) =>
      segs(t).foreach(g => df(g) = df.getOrElse(g, Set.empty) + id)
    }
    val boiler = df.collect { case (g, ids) if ids.size >= 3 => g }.toSet
    assert(boiler.nonEmpty, "fixture yields no df>=3 segments — vacuous")
    val expected = corpus.map { case (id, t) =>
      val ss = segs(t)
      val kept = ss.filterNot(boiler)
      id -> ((ss.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
    val got = SparkEntry.queries("c18_boilerplate_strip")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == expected)
    assert(expected.exists { case (_, (n, k, _)) => k < n },
      "nothing stripped — strip path untested")
    assert(expected.exists { case (_, (n, k, _)) => k == n && n > 0 },
      "everything stripped — keep path untested")
  }

  test("c18b anti-join strip: row-equal to c18, and actually an anti-join (no broadcast set)") {
    val broadcastForm = SparkEntry.queries("c18_boilerplate_strip")(spark, sf)
    val antiForm = SparkEntry.queries("c18b_boilerplate_strip_antijoin")(spark, sf)
    assert(antiForm.collect().toSeq == broadcastForm.collect().toSeq,
      "anti-join form diverged from the broadcast form")
    val plan = antiForm.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"c18b lost its anti-join:\n${plan.take(600)}")
    // the boilerplate SET must not be probed as a collected scalar array
    // (c18's crossJoin(broadcast(one-row array)) + array_contains device)
    assert(!plan.contains("array_contains"),
      "c18b still scans a materialized boilerplate array")
  }

  test("d9 containment flags every snippet in its source; Jaccard misses the long ones") {
    import org.apache.spark.sql.functions._
    val d9 = SparkEntry.queries("d9_containment")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sources = graft.etl.Tables.table(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(sources.nonEmpty)
    // a snippet's shingles are a subset of its source's, so the directed
    // (snippet, source) pair must surface with containment exactly 1.0
    for (d <- sources)
      assert(d9.exists(t => t._1 == d + 2000000L && t._2 == d && t._3 == 1.0),
        s"snippet of doc $d not flagged as contained in its source")
    // and the operator exists because symmetric Jaccard at the SAME tau
    // structurally misses the long-doc snippets (jaccard = n_snip/n_doc)
    val jacSnip = graft.ext.Dedup.ngramJaccardPairs(
        ExtensionQueries.docsSnippetFixture(spark, sf), n = 7,
        threshold = 0.8, dfMax = Some(1000))
      .filter(col("id2") >= 2000000L || col("id1") >= 2000000L)
      .count()
    val d9Snip = d9.count(t => t._1 >= 2000000L)
    assert(jacSnip < d9Snip,
      s"Jaccard caught $jacSnip snippet pairs vs containment's $d9Snip - " +
        "the fixture no longer demonstrates the asymmetric case")
  }

  test("t26 token entropy: exact replay off the pinned log table; bounds; cap headroom") {
    val got = SparkEntry.queries("t26_token_entropy")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.nonEmpty)
    val raw = graft.etl.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var maxN = 0
    raw.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val n = toks.length
      maxN = math.max(maxN, n)
      val counts = toks.groupBy(identity).map(_._2.length)
      val hNum = n.toLong * ExtensionQueries.lnE12(n - 1) -
        counts.map(c => c.toLong * ExtensionQueries.lnE12(c - 1)).sum
      val e6 = hNum / (n.toLong * 1000000L)
      val (gn, gt, ge) = got(id)
      assert(gn == n && gt == counts.size, s"doc $id counts")
      assert(ge == e6, s"doc $id entropy $ge vs $e6")
      // 0 ≤ H ≤ ln n, and H = 0 iff the doc is one repeated type
      assert(ge >= 0 && ge <= ExtensionQueries.lnE12(n - 1) / 1000000L, id)
      assert((ge == 0 && counts.size == 1) || (ge > 0 && counts.size > 1) ||
        n == 1, s"doc $id zero-entropy class")
      }
    // every doc replayed; the pinned-table cap carries ≥4× headroom
    assert(got.keySet == raw.map(_._1).toSet, "no doc dropped by the cap")
    assert(maxN * 4 <= ExtensionQueries.LnCap,
      s"fixture max $maxN vs cap ${ExtensionQueries.LnCap}")
    // r15 ADVICE: out-of-cap docs must DROP, never survive with residual
    // totals — a doc with one token past the cap (n > cap via c > cap)
    // and one with many in-cap tokens (n > cap, every c ≤ cap) both
    // vanish; an in-cap sibling stays. Before the LEFT-join fix the
    // first doc survived with silently wrong n_tokens/n_types/entropy.
    import spark.implicits._
    val over = Seq(
      (1L, Array.fill(ExtensionQueries.LnCap + 5)("hot").mkString(" ")),
      (2L, (0 until ExtensionQueries.LnCap + 5).map(i => s"w$i").mkString(" ")),
      (3L, "a a b")).toDF("doc_id", "text")
    val kept = ExtensionQueries.tokenEntropyOf(spark, over)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L),
      s"cap gate wrong: kept $kept (out-of-cap docs must drop, 3 must stay)")
  }

  test("t27 gopher rules: full Scala replay on the injected fixture; keep has both outcomes") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("t27_gopher_rules")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getBoolean(9))).toMap
    val raw = graft.etl.Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == raw.length)
    // Spark's trim() strips SPACES only (not the injected newlines) —
    // the replay must match that, not Scala's all-whitespace .trim
    def trimSp(s: String): String =
      s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val stops = ExtensionQueries.GopherStops.toSet
    var keeps = 0
    raw.foreach { case (id, t0) =>
      val rep = t0.replace("line", "\n- line").replace("batch", "\nbatch")
      val t = if (id % 7 == 0) rep + " # ## ..."
        else if (id % 3 == 0) rep + " and that have with" else rep
      val words = trimSp(t).toLowerCase.split("\\s+", -1)
      val lines = t.split("\n", -1).map(trimSp).filter(_.nonEmpty)
      val nW = words.length.toLong
      val sumW = words.map(_.length.toLong).sum
      val nSym = words.count(w => w.contains("#") || w.contains("...")).toLong
      val nBul = lines.count(_.startsWith("- ")).toLong
      val nEll = lines.count(_.endsWith("...")).toLong
      val nAlpha = words.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val nStop = words.distinct.count(stops).toLong
      val keep = nW >= 50 && nW <= 100000 &&
        3 * nW <= sumW && sumW <= 10 * nW &&
        10 * nSym <= nW && 10 * nBul <= 9 * lines.length &&
        10 * nEll <= 3 * lines.length && 5 * nAlpha >= 4 * nW && nStop >= 2
      if (keep) keeps += 1
      assert(got(id) == ((nW, sumW, lines.length.toLong, nSym, nBul, nEll,
        nAlpha, nStop, keep)), s"doc $id: ${got(id)}")
    }
    // the gate is LIVE in both directions (the r16 fixture lesson: the
    // synthetic vocabulary lacks 7 of the 8 Gopher stops, so without
    // the stop-word injection keep was uniformly false — a filter that
    // rejects everything has an untested pass branch)
    assert(keeps > 0 && keeps < raw.length, s"keep not bimodal: $keeps")
  }

  test("c33 repetition signals: Scala line-multiset replay; duplicates exist by construction") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("c33_repetition_signals")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val raw = graft.etl.Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def trimSp(s: String): String =
      s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    var anyDup = false
    raw.foreach { case (id, t0) =>
      val rep = t0.replace("line", "\n- line").replace("batch", "\nbatch")
      val t = if (id % 7 == 0) rep + " # ## ..."
        else if (id % 3 == 0) rep + " and that have with" else rep
      val lines = t.split("\n", -1).map(trimSp).filter(_.nonEmpty)
      val mult = lines.groupBy(identity).view.mapValues(_.length.toLong)
      val nLines = lines.length.toLong
      val nDistinct = mult.size.toLong
      val nDup = mult.values.filter(_ > 1).sum
      val maxM = mult.values.max
      val tot = mult.map { case (l, m) => m * l.length }.sum
      val dup = mult.collect { case (l, m) if m > 1 => m * l.length }.sum
      val fracE6 = BigInt(1000000) * dup / tot
      if (nDup > 0) anyDup = true
      assert(got(id) == ((nLines, nDistinct, nDup, maxM, fracE6.toLong)),
        s"doc $id: ${got(id)}")
    }
    assert(anyDup, "injected 'batch'-runs produced no duplicate lines — " +
      "the repetition branch is vacuous")
  }

  test("c34 DSIR reweighting: exact integer replay of the hashed-bigram " +
    "log-ratio models") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("c34_dsir_reweight")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val raw = graft.etl.Tables.table(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val P = 1000000007L
    val B = ExtensionQueries.DsirBuckets.toInt
    val (ha, hb) =
      graft.ext.HashCoeffs.coeffs(1, ExtensionQueries.DsirSeed).head
    def rh(t: String): Long = t.getBytes("UTF-8")
      .foldLeft(0L)((h, b) => (h * 131 + (b & 0xff)) % P)
    def bigramsOf(text: String): Seq[String] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
      else Seq(toks.mkString(" "))
    }
    val perDoc = raw.map { case (id, lang, text) =>
      (id, lang, bigramsOf(text).map(bg => (((ha * rh(bg) + hb) % P) % B).toInt))
    }
    val cr = Array.fill(B)(0L)
    val ct = Array.fill(B)(0L)
    perDoc.foreach { case (_, lang, bks) =>
      bks.foreach { k => cr(k) += 1; if (lang == "en") ct(k) += 1 }
    }
    val tr = cr.sum
    val tt = ct.sum
    val ln = ExtensionQueries.lnE12
    val lr = (0 until B).map { k =>
      val r = ((ct(k) + 1) * (tr + B) * 100) / ((cr(k) + 1) * (tt + B))
      val rc = math.min(math.max(r, 10L), 1000L)
      ln(rc.toInt - 1) - ln(100 - 1)
    }
    assert(got.size == raw.length)
    perDoc.foreach { case (id, _, bks) =>
      val w = bks.groupBy(identity).iterator
        .map { case (k, xs) => xs.size.toLong * lr(k) }.sum
      assert(got(id) == ((bks.size.toLong, w)), s"doc $id: ${got(id)}")
    }
    // diagnostic, not semantics: the statistic actually separates docs
    // on this fixture (if regeneration ever collapses it, that's a
    // fixture-contract change, not a code bug — see the s9 precedent)
    assert(got.values.map(_._2).toSet.size > 1,
      "fixture-contract: all DSIR weights identical")
  }

  test("d14 dup census: partition identities; consistent with d6's clustered ids") {
    val census = SparkEntry.queries("d14_dup_census")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(census.nonEmpty)
    // the census is a PARTITION of the corpus: Σ n_docs = corpus size,
    // n_docs = size·count per row, shares sum to ~10⁶ (floor slack ≤ rows)
    census.foreach { case (sz, nc, nd, _) => assert(nd == sz * nc) }
    val corpus = SparkEntry.queries("d6_dedup_clusters")(spark, sf)
    val nDocs = graft.etl.Tables.table(spark, sf, "documents").count() +
      graft.etl.Tables.table(spark, sf, "documents")
        .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
        .count() + 2 // docsNear = documents ∪ near-copies ∪ 2 shortDocs
    assert(census.map(_._3).sum == nDocs,
      s"census covers ${census.map(_._3).sum} of $nDocs docs")
    val shareSum = census.map(_._4).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - census.length,
      s"shares sum to $shareSum")
    // every d6-clustered id is in a ≥2 cluster, and the counts agree
    val clustered = corpus.count()
    assert(census.filter(_._1 >= 2).map(_._3).sum == clustered,
      "multi-doc census mass equals d6's clustered id count")
    // the dup fixture guarantees multiplicity-2 clusters exist
    assert(census.exists(_._1 == 2L), "no size-2 clusters on the dup fixture")
  }

  test("d10 span dedup: exact scala replay on the dup fixture, keep-first semantics") {
    // driver-side replay of the keep-first rule over the SAME dup-injected
    // corpus the registry query runs on: first (doc_id, seg_no) occurrence
    // of every aligned 8-token segment survives, later ones are deleted
    val docs = graft.etl.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val withDups = (docs ++ docs.collect {
      case (id, t) if id % 10 == 0 => (id + 1000000L) -> t
    }).sortBy(_._1)
    def segs(text: String): Seq[String] =
      text.trim.toLowerCase.split("\\s+").toSeq
        .grouped(8).map(_.mkString(" ")).toSeq
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = withDups.map { case (id, t) =>
      val ss = segs(t)
      val kept = ss.filter(g => seen.add(g))
      id -> ((ss.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
    val got = SparkEntry.queries("d10_span_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == expected)
    // non-vacuous: every injected copy empties out (all its spans were
    // already kept by the original); the base corpus exercises BOTH the
    // intact path and the partial-strip path (short tail segments — the
    // last aligned segment of a doc can be <8 tokens — collide naturally
    // across base docs, so later docs lose just that tail)
    assert(expected.forall { case (id, (_, k, _)) => id < 1000000L || k == 0L })
    assert(expected.exists { case (id, (n, k, _)) => id < 1000000L && k == n && n > 0L })
    assert(expected.exists { case (id, (n, k, _)) => id < 1000000L && 0L < k && k < n })
  }

  test("d10 span dedup: partial strip + intra-doc repeats, first copy always survives") {
    import spark.implicits._
    val eight = "s1 s2 s3 s4 s5 s6 s7 s8"
    val fixture = Seq(
      1L -> (eight + " u1 u2 u3 u4 u5 u6 u7 u8"),   // defines the span
      2L -> (eight + " v1 v2 v3 v4 v5 v6 v7 v8"),   // loses seg 0, keeps its own
      3L -> (eight + " " + eight),                   // intra-doc repeat collapses
      4L -> "w1 w2 w3"                               // untouched short doc
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.spanDedup(fixture).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 2L, 2L, eight + " u1 u2 u3 u4 u5 u6 u7 u8")))
    assert(got(1) == ((2L, 2L, 1L, "v1 v2 v3 v4 v5 v6 v7 v8")))
    assert(got(2) == ((3L, 2L, 0L, "")))
    assert(got(3) == ((4L, 1L, 1L, "w1 w2 w3")))
  }

  test("j10 point-in-time join: one row per order, interval contains d-1, " +
      "cold start is NULL") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("j10_scd2_pit_join")(spark, sf)
    val nOrders = graft.etl.Tables.table(spark, sf, "orders").count()
    // LEFT join multiplicity: interval disjointness ⇒ exactly one output
    // row per order (a duplicate here means overlapping versions)
    assert(got.count() == nOrders)
    assert(got.select("o_orderkey").distinct().count() == nOrders)
    val hist = ExtensionQueries.scd2History(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDate(3), Option(r.getDate(4))))
    val firstChange = hist.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._4.toLocalDate).min(Ordering[java.time.chrono.ChronoLocalDate])
    }
    val rows = got.collect()
    val byVersion = hist.map(h => (h._1, h._2) -> h).toMap
    var nulls = 0L
    rows.foreach { r =>
      val (ck, d) = (r.getLong(1), r.getDate(2).toLocalDate)
      val probe = d.minusDays(1)
      if (r.isNullAt(3)) {
        nulls += 1
        // NULL ⇔ the probe date predates the customer's first version —
        // the leakage-safe cold-start answer, never a silent fill
        assert(probe.isBefore(firstChange(ck)),
          s"order ${r.getLong(0)}: NULL but a version covers $probe")
      } else {
        val (_, _, prio, from, to) = byVersion((ck, r.getLong(4)))
        assert(prio == r.getString(3))
        assert(!from.toLocalDate.isAfter(probe),
          s"order ${r.getLong(0)}: version starts after probe")
        assert(to.forall(t => t.toLocalDate.isAfter(probe)),
          s"order ${r.getLong(0)}: version closed before probe")
      }
    }
    // the d−1 probe is load-bearing: each customer's FIRST order of a
    // priority run must see the PRIOR run's value (or NULL), not its own
    assert(nulls > 0, "no cold-start orders — fixture degenerate")
    val selfSeen = rows.count(r => !r.isNullAt(3))
    assert(selfSeen > 0)
  }

  test("x7 sub-width rule: widens with the corpus; widened enumeration " +
      "is row-identical and bound-respecting") {
    import org.apache.spark.sql.functions._
    // the sizing rule itself: gate scale resolves to today's width 1;
    // the breakpoint is 256·target (expected occupancy corpus/256
    // crossing the target), then 4096·target, capped at 7
    assert(ExtensionQueries.subWidthFor(500L) == 1)
    assert(ExtensionQueries.subWidthFor(256L * (1L << 24)) == 1)
    assert(ExtensionQueries.subWidthFor(256L * (1L << 24) + 256) == 2)
    assert(ExtensionQueries.subWidthFor(4096L * (1L << 24) + 4096) == 3)
    assert(ExtensionQueries.subWidthFor(Long.MaxValue) == 7)
    // a 10× corpus against a small executor target: the rule widens
    // AUTOMATICALLY (no caller judgment), and the widened run is
    // row-identical to the gate-width run — the oracle-stated per-shard
    // rank is width-invariant because sub is a hash prefix
    val docs = graft.etl.Tables.table(spark, sf, "documents")
      .select("doc_id")
    val ids10 = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id")))
      .reduce(_ unionAll _)
    val n10 = ids10.count()
    val target = 4L
    val w10 = ExtensionQueries.subWidthFor(n10, target)
    assert(w10 == 2, s"10x corpus ($n10 rows, target $target) chose width $w10")
    assert(ExtensionQueries.subWidthFor(n10 / 10, target) == 1,
      "gate-size corpus should keep width 1 at this target")
    val wide = ExtensionQueries.shardShuffle(ids10, w10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val narrow = ExtensionQueries.shardShuffle(ids10, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(wide == narrow, "widened enumeration diverged from width 1")
    // the bound the widening exists to enforce: realized max window-group
    // rows at the chosen width — the rule is stated in expectation
    // (corpus/16^(1+w) ≤ target); md5 balance keeps the realized max
    // within a small constant of it, vs width 1 where groups are ~16×
    // the target and an executor-sized bound is simply not held
    def maxGroup(width: Int): Long = ids10
      .select(md5(col("doc_id").cast("string")).as("h"))
      .groupBy(substring(col("h"), 1, 1 + width)).count()
      .agg(max("count")).head().getLong(0)
    val realized = maxGroup(w10)
    assert(realized <= 4L * target,
      s"widened max group $realized exceeds 4x target $target")
    assert(maxGroup(1) > 4L * target,
      "width 1 already met the bound — fixture no longer exercises widening")
  }

  test("w11: the 3-sigma inequality replays exactly in BigInt; warm-up rows false") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("w11_rolling_anomaly")(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.length > 100)
    assert(got.map(_._1).toSeq == got.map(_._1).sortBy(identity).toSeq)
    val vs = got.map(t => BigInt(t._2))
    got.zipWithIndex.foreach { case ((day, v, n, flag), i) =>
      val frame = vs.slice(math.max(0, i - 6), i + 1)
      assert(n == frame.length, s"$day frame size $n vs ${frame.length}")
      val s = frame.sum
      val q = frame.map(x => x * x).sum
      val nn = BigInt(frame.length)
      val lhs = (nn * BigInt(v) - s).pow(2)
      val expected = frame.length == 7 && lhs > BigInt(9) * (nn * q - s * s)
      assert(flag == expected, s"$day flag $flag vs $expected")
    }
    assert(got.take(6).forall(!_._4), "warm-up days must report false")
  }

  test("b2b: the 10-day deadline binds both bounded stages without emptying the funnel") {
    val dir = "/root/testdata/sf0.01"
    def stages(q: String) = SparkEntry.queries(q)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val free = stages("b2_funnel")
    val bound = stages("b2b_funnel_window")
    assert(bound(1L) == free(1L), "stage 1 has no deadline — counts must match")
    assert(bound(2L) <= free(2L) && bound(3L) <= free(3L))
    assert(bound(2L) < free(2L) && bound(3L) < free(3L),
      s"deadline never binds ($bound vs $free) — fixture degenerate")
    assert(bound(2L) > 0 && bound(3L) > 0,
      s"funnel emptied ($bound) — window too tight to be meaningful")
  }

  test("d13: every near-copy pairs with its source; cos replays from exact longs") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("d13_tf_cosine")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.nonEmpty)
    val texts = graft.etl.Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // recall on the injected fixture: a near-copy drops ONE word, so the
    // tf vectors are near-identical and every (src, src+1e6) pair must
    // clear τ = 0.8
    val expected = texts.keySet.filter(_ % 10 == 0)
    assert(expected.nonEmpty)
    expected.foreach { id =>
      assert(got.contains((id, id + 1000000L)), s"missed near-copy pair of $id")
    }
    // exact replay of dot/norms/cos for every reported source pair
    def tf(text: String): Map[String, Long] =
      text.trim.toLowerCase.split("\\s+").toSeq
        .groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    got.keys.filter(p => p._2 == p._1 + 1000000L).take(50).foreach {
      case (a, b) =>
        val ta = tf(texts(a))
        val tb = tf(texts(a).replaceFirst("^\\S+\\s+", ""))
        val dot = ta.keysIterator
          .map(t => ta(t) * tb.getOrElse(t, 0L)).sum
        val na = ta.valuesIterator.map(v => v * v).sum
        val nb = tb.valuesIterator.map(v => v * v).sum
        val cos = dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
        val (gd, gc) = got((a, b))
        assert(gd == dot && gc == cos, s"pair ($a,$b): ($gd,$gc) vs ($dot,$cos)")
    }
  }

  test("x10: every surviving class has >= k members; suppression binds both ways") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("x10_k_anonymity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3)))
    assert(got.nonEmpty)
    // k-anonymity holds on the OUTPUT: every non-suppressed quasi-id
    // class has >= 10 members, and suppressed rows reveal nothing
    val kept = got.filter(!_._4)
    val suppressed = got.filter(_._4)
    assert(kept.nonEmpty && suppressed.nonEmpty,
      s"k never binds (kept ${kept.length}, suppressed ${suppressed.length})")
    kept.groupBy(t => (t._2, t._3)).foreach { case (cls, rows) =>
      assert(rows.length >= 10, s"class $cls leaked with ${rows.length} < k")
    }
    suppressed.foreach { case (id, r, m, _) =>
      assert(r == "*" && m == "*", s"row $id suppressed but quasi-ids visible")
    }
  }

  test("c25: copies and their sources score zero novelty; ratio is exact") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("c25_novelty")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val byId = got.map(t => t._1 -> t).toMap
    val copies = got.filter(_._1 >= 1000000L)
    assert(copies.nonEmpty, "dup injection missing")
    copies.foreach { case (id, _, novel, e6) =>
      assert(novel == 0L && e6 == 0L, s"copy $id has novel shingles")
      val (_, _, srcNovel, srcE6) = byId(id - 1000000L)
      assert(srcNovel == 0L && srcE6 == 0L, s"source of copy $id not zeroed")
    }
    got.foreach { case (id, nsh, novel, e6) =>
      assert(novel <= nsh, s"doc $id count inversion")
      assert(e6 == 1000000L * novel / nsh, s"doc $id fixed-point drift")
    }
    assert(got.exists(_._4 > 900000L), "no high-novelty docs — degenerate")
  }

  test("w12: Holt level/trend replays the exact two-variable fold") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("w12_holt")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    val ev = ExtensionQueries.eventsThin(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, es) =>
      val vs = es.sortBy(e => (e._2, e._3)).map(_._4)
      var l = vs.head
      var b = 0.0
      vs.tail.foreach { x =>
        val nl = (0.5 * x) + (0.5 * (l + b))
        val nb = (0.25 * (nl - l)) + (0.75 * b)
        l = nl; b = nb
      }
      (u, vs.length.toLong, l, b, l + b)
    }
    assert(got.toSeq == want)
    assert(got.exists(_._4 != 0.0), "every trend exactly zero — degenerate")
    got.foreach { case (u, _, l, b, f) => assert(f == l + b, s"user $u") }
  }

  test("x11: erasure audit balances and the cascade leaves no survivors") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("x11_gdpr_erasure")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set("customers", "sales"))
    got.foreach { case (t, (before, removed, after)) =>
      assert(before == removed + after, s"$t audit does not balance")
      assert(removed > 0, s"$t: empty request set — degenerate fixture")
      assert(removed * 8 < before, s"$t: 1/16 md5 slice removed too much")
    }
    // the audit's counts equal what the actual anti-join rewrite retains,
    // and the retained tables genuinely contain no forgotten subject
    val forgotten = (c: org.apache.spark.sql.Column) =>
      substring(md5(c.cast("string")), 1, 1) === "f"
    val cust = etl.Pipelines.cleanCustomers(spark, dir)
    val sales = etl.Pipelines.cleanSales(spark, dir)
    val keptC = cust.filter(!forgotten(col("customer_id")))
    val keptS = sales.filter(!forgotten(col("customer_id")))
    assert(keptC.count() == got("customers")._3)
    assert(keptS.count() == got("sales")._3)
    assert(keptC.filter(forgotten(col("customer_id"))).count() == 0)
    assert(keptS.filter(forgotten(col("customer_id"))).count() == 0)
  }

  test("b11: Wilson bounds replay exactly and bracket p-hat inside [0,1]") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("b11_conversion_ci")(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    got.foreach { case (day, n, conv, p, lo, hi) =>
      val nd = n.toDouble
      val pw = conv.toDouble / nd
      val z = 1.96
      val center = pw + z * z / (2.0 * nd)
      val margin = z * math.sqrt((pw * (1.0 - pw) + z * z / (4.0 * nd)) / nd)
      val denom = 1.0 + z * z / nd
      assert(p == pw, day)
      assert(lo == (center - margin) / denom, s"$day lo")
      assert(hi == (center + margin) / denom, s"$day hi")
      assert(0.0 <= lo && lo <= p && p <= hi && hi <= 1.0, s"$day bracket")
    }
    // the interval genuinely reflects evidence: same-p̂-more-n must narrow
    val widths = got.map(t => (t._2, t._6 - t._5))
    assert(widths.map(_._2).max > widths.map(_._2).min, "flat widths")
  }

  test("c27: chi-square drift replays on the BigInt rate grid; mass accounts") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("c27_chi2_drift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val rows = etl.Tables.table(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = rows.flatMap { case (src, text) =>
      text.trim.toLowerCase.split("\\s+").map(t => (src, t))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySrc = counts.groupBy(_._1._1)
    val corpus = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nTot = BigInt(corpus.values.sum)
    val rc = corpus.view.mapValues(b => BigInt(1000000000L) * b / nTot).toMap
    val rTot = rc.values.sum
    val want = bySrc.toSeq.sortBy(_._1).map { case (src, toks) =>
      val nS = BigInt(toks.values.sum)
      val present = toks.map { case ((_, t), a) =>
        val ro = BigInt(1000000000L) * a / nS
        val d = ro - rc(t)
        (BigInt(1000000) * d * d) / rc(t).max(1)
      }.sum
      // toSeq first: mapping a key SET would collapse equal rc values
      val rcPresent = toks.keys.toSeq.map { case (_, t) => rc(t) }.sum
      (src, nS.toLong,
        ((present + BigInt(1000000) * (rTot - rcPresent)) / 1000000).toLong)
    }
    assert(got.toSeq == want)
    assert(got.forall(_._3 >= 0))
    assert(got.map(_._3).distinct.size > 1, "flat drift — degenerate fixture")
  }

  test("j11: token blocking finds exactly the shared-token brute-force pairs") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("j11_fuzzy_name_match")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    // the name domain is bounded, so ALL-PAIRS brute force is affordable
    // here and is the ground truth token blocking approximates
    val names = etl.Tables.table(spark, dir, "part")
      .groupBy("p_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ns = names.keys.toSeq.sorted
    val brute = for {
      i <- ns.indices; j <- (i + 1) until ns.size
      if lev(ns(i), ns(j)) <= 4
    } yield (ns(i), ns(j))
    val blocked = brute.filter { case (a, b) =>
      a.split(" ").toSet.intersect(b.split(" ").toSet).nonEmpty
    }
    val want = blocked.map { case (a, b) =>
      (a, b, lev(a, b).toLong, names(a), names(b))
    }
    assert(got.toSeq == want)
    // the measured blocking blind spot: pairs this close that share NO
    // token. On the adjective-noun names every such miss needs edits in
    // BOTH words, so blocking recall is FULL at lev ≤ 3 and only lev-4
    // pairs can escape — the gap the registry comment documents. If the
    // name generator ever changes shape, this pins the recall contract
    // instead of letting output silently shrink.
    val missed = brute.toSet -- blocked.toSet
    assert(missed.forall { case (a, b) => lev(a, b) == 4 },
      s"blocking now misses pairs CLOSER than lev 4: ${missed.take(5)}")
    assert(missed.nonEmpty,
      "blind spot vanished — tighten the documented recall claim")
  }

  test("c26: negatives replay from plain-Scala md5 draws; no positive leaks") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("c26_negative_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val pos = etl.Pipelines.cleanSales(spark, dir)
      .select("customer_id", "product_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nParts = etl.Tables.table(spark, dir, "part")
      .agg(org.apache.spark.sql.functions.max("p_partkey")).head().getLong(0) + 1
    def draw(cust: Long, j: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$cust#$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % nParts
    }
    val want = pos.map(_._1).toSeq.sorted.flatMap { cust =>
      val cands = (1 to 9).map(j => draw(cust, j) -> j.toLong)
        .groupBy(_._1).map { case (p, js) => (p, js.map(_._2).min) }
      cands.toSeq.filter(t => !pos((cust, t._1)))
        .sortBy(_._2).take(3)
        .map { case (p, j) => (cust, p, j) }
    }
    assert(got.toSeq == want)
    got.foreach { case (c, p, _) =>
      assert(!pos((c, p)), s"positive ($c,$p) leaked into the negatives")
    }
    // the 3× slack holds on this fixture: every customer fills its k=3
    val perCust = got.groupBy(_._1).view.mapValues(_.size)
    assert(perCust.values.forall(_ == 3),
      s"starved customers: ${perCust.filter(_._2 != 3).keys.take(5)}")
  }

  test("b10: KM product-limit replays exactly in plain Scala; censoring binds") {
    // two scales — the censored fraction and the day-spine length both
    // change with sf, so a single-scale replay could hide a boundary slip
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = SparkEntry.queries("b10_kaplan_meier")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      assert(got.nonEmpty, dir)
      // replay straight off the raw events
      val ev = etl.Tables.events(spark, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_type"), col("value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      val endUs = ev.map(_._2).max
      val durs = ev.groupBy(_._1).values.map { es =>
        val first = es.map(_._2).min
        val conv = es.filter(e => e._3 == "purchase" && e._4 >= 180.0)
          .map(_._2).minOption
        ((conv.getOrElse(endUs) - first) / 86400000000L, conv.isDefined)
      }.toSeq
      val n = durs.size
      val spine = durs.groupBy(_._1).toSeq.sortBy(_._1)
      var atRisk = n.toLong
      var surv = 1.0
      val want = spine.map { case (day, rs) =>
        val d = rs.count(_._2).toLong
        val c = rs.count(!_._2).toLong
        val row = (day, atRisk, d, c,
          { surv *= 1.0 - d.toDouble / atRisk.toDouble; surv })
        atRisk -= d + c
        row
      }
      assert(got.toSeq == want, dir)
      // survival is non-increasing and the censored mass keeps it > 0
      assert(got.map(_._5).sliding(2).forall(p => p(0) >= p(1)), dir)
      assert(got.map(_._4).sum > 0, s"$dir: no censored users — degenerate")
      assert(got.last._5 > 0.0,
        s"$dir: curve hit zero despite censoring — event filter drifted")
      assert(got.map(t => t._3 + t._4).sum == n, dir)
    }
  }

  test("c28 quantile normalization: rank-preserving within source; pooled quantile law holds") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("c28_quantile_normalize")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    val all = got.map(_._3).sorted
    val nPool = all.length
    got.foreach { case (id, _, _, r2, nS, norm) =>
      // the defining law: norm = smallest pooled value whose pooled CDF
      // reaches the doc's within-source midrank quantile
      val want = all.find(v => {
        val pcum = all.count(_ <= v).toLong
        2L * nS * pcum >= nPool.toLong * r2
      }).get
      assert(norm == want, s"doc $id")
    }
    // within each source, normalization preserves the raw order
    got.groupBy(_._2).foreach { case (src, rs) =>
      val byRaw = rs.sortBy(t => (t._3, t._1))
      assert(byRaw.map(_._6).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1)), src)
    }
    // and it genuinely moves values (the correction is non-vacuous)
    assert(got.exists(t => t._3 != t._6),
      "normalization is the identity everywhere — sources already aligned")
  }

  test("b14 decay attribution: dyadic credits replay exactly; shares account for all credit") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("b14_decay_attribution")(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.nonEmpty)
    val ev = graft.etl.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val conv = ev.filter(_._2 == "purchase")
    val touch = ev.filter(t => t._2 == "click" || t._2 == "view")
    val byUser = touch.groupBy(_._1)
    val credits = conv.flatMap { case (u, _, pUs) =>
      byUser.getOrElse(u, Array.empty).flatMap { case (_, ch, tUs) =>
        val d = pUs - tUs
        if (d >= 0 && d < 14L * 86400000000L)
          Some(((ch, d / 86400000000L), 8192L >> (d / 86400000000L).toInt))
        else None
      }
    }
    val want = credits.groupBy(_._1).view
      .mapValues(cs => (cs.length.toLong, cs.map(_._2).sum)).toMap
    val total = want.values.map(_._2).sum
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (k, (n, c, share)) =>
      assert((n, c) == want(k), k)
      assert(share == BigInt(1000000) * c / total, k)
    }
    // floor shares must reconstruct the total within |rows| millionths
    val shareSum = got.map(_._2._3).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - got.length, shareSum)
    // the decay must genuinely discount: age-0 credit per touch is 8192,
    // and some touch older than a week must appear (the window binds)
    assert(got.exists(_._1._2 >= 7L))
  }

  test("t23 BM25: scores replay the textbook formula; absent terms contribute zero") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("t23_bm25_search")(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getDouble(4)))
    assert(got.length == 20)
    val toks = graft.etl.Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.ext.TextAnalysis.tokens(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val nd = toks.length.toLong
    val tt = toks.map(_._2.length.toLong).sum
    val q = Seq("scan", "join", "window")
    val df = q.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    def score(tf: Long, dl: Long, dfT: Long): Double =
      ((nd + 1).toDouble / (dfT + 1).toDouble) * (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble * nd.toDouble / tt.toDouble)))
    val wantAll = toks.map { case (id, w) =>
      val dl = w.length.toLong
      val ss = q.map { t =>
        val tf = w.count(_ == t).toLong
        if (tf == 0) None else Some(score(tf, dl, df(t)))
      }
      (id, ss(0), ss(1), ss(2),
        ss.flatten.sum)
    }
    val top = wantAll.sortBy(t => (-t._5, t._1)).take(20)
    got.zip(top).foreach { case (g, w) =>
      assert(g._1 == w._1, s"rank order: got doc ${g._1}, want ${w._1}")
      assert(math.abs(g._5 - w._5) < 1e-9, g._1)
      Seq((g._2, w._2), (g._3, w._3), (g._4, w._4)).foreach {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, g._1)
        case (None, None) =>
        case other => fail(s"doc ${g._1}: null mismatch $other")
      }
    }
    // tf saturation: a doc's per-term score must stay below the k1+1
    // asymptote times the idf surrogate
    got.foreach { case (id, s1, s2, s3, _) =>
      Seq("scan" -> s1, "join" -> s2, "window" -> s3).foreach {
        case (t, Some(s)) =>
          assert(s < ((nd + 1).toDouble / (df(t) + 1).toDouble) * 2.2, id)
        case _ =>
      }
    }
  }

  test("t22 trigram coverage: tiers partition positions; ladder is non-degenerate; tables bounded") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("t22_trigram_coverage")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty)
    // tiers partition every doc's trigram positions exactly
    got.foreach { case (id, nPos, t3, t2, t1, t0, fam) =>
      assert(t3 + t2 + t1 + t0 == nPos, s"doc $id tiers don't partition")
      assert(nPos >= 1, s"doc $id")
      assert(fam == 1000000L * (3 * t3 + 2 * t2 + t1) / (3 * nPos), s"doc $id")
      assert(fam >= 0 && fam <= 1000000L)
    }
    // the backoff ladder must genuinely fire at multiple depths on this
    // corpus (all-one-tier would mean the top-K thresholds are vacuous)
    assert(got.map(_._3).sum > 0, "no trigram-tier hits")
    assert(got.map(_._4).sum > 0, "no bigram-backoff hits")
    assert(got.map(_._5).sum > 0, "no unigram-backoff hits")
    // a doc fully inside the trigram table scores exactly 1.0
    got.filter(t => t._3 == t._2).foreach(t => assert(t._7 == 1000000L))
    // every doc with >= 3 tokens is covered (the pinned drop rule)
    val nDocs = graft.etl.Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.ext.TextAnalysis.tokens(col("text")).as("w"))
      .filter(org.apache.spark.sql.functions.size(col("w")) >= 3)
      .count()
    assert(got.length.toLong == nDocs)
  }

  test("b13 RFM: scores replay the cutoff rule; quintiles populated; taxonomy covers") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("b13_rfm_segments")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    assert(got.nonEmpty)
    // scores live in 1..5 and the monetary dimension (near-continuous)
    // populates every quintile
    assert(got.forall(t => Seq(t._5, t._6, t._7).forall(s => s >= 1 && s <= 5)))
    assert(got.map(_._7).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      "m_score quintiles not all populated")
    // score is monotone in the underlying value (the cutoff rule's defining
    // property): sort by m_cents, m_score must be non-decreasing
    val byM = got.sortBy(_._4).map(_._7)
    assert(byM.zip(byM.tail).forall(p => p._1 <= p._2))
    val byR = got.sortBy(_._2).map(_._5)
    assert(byR.zip(byR.tail).forall(p => p._1 >= p._2),
      "r_score must fall as recency-days grow")
    // segment CASE replays from the scores
    got.foreach { case (_, _, _, _, r, f, _, seg) =>
      val want = if (r >= 4 && f >= 4) "champion"
        else if (r >= 4) "recent"
        else if (r <= 2 && f >= 4) "at_risk"
        else "regular"
      assert(seg == want)
    }
    // the taxonomy must genuinely partition the base (≥2 segments occupied)
    assert(got.map(_._8).distinct.length >= 2)
  }

  test("x12 pseudonymized join: row-equal to the raw-key join; pseudonyms leak no key") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("x12_pseudonymized_join")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // the same aggregate joined on the RAW key, pseudonym applied after —
    // identical rows proves the salted hash preserved the join graph
    // (md5 on a ≤20-digit decimal key space is collision-free in practice;
    // a collision would MERGE two groups and fail this equality)
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val raw = graft.etl.Tables.events(spark, dir)
      .select(col("user_id"),
        (col("value").cast(dec) * org.apache.spark.sql.functions.lit(100))
          .cast("long").as("cents"))
      .join(graft.etl.Pipelines.cleanCustomers(spark, dir)
        .select(col("customer_id"), col("region")),
        col("user_id") === col("customer_id"))
      .groupBy("user_id", "region")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum("cents").as("val_cents"))
      .select(md5(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("graft-pii-v1:"),
        col("user_id").cast("string"))).as("pid"),
        col("region"), col("n_events"), col("val_cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.toSeq == raw.sorted.toSeq)
    // pseudonyms are 32-hex and never echo the raw key
    assert(got.forall(_._1.matches("[0-9a-f]{32}")))
  }

  test("x13 DP count: seeded geometric draw replays exactly; noise in ±20; clamp at 0") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("x13_dp_count")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val truth = graft.etl.Pipelines.cleanCustomers(spark, dir)
      .groupBy("region")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map(_._1).toSet == truth.keySet)
    got.foreach { case (region, nNoisy, epsE6) =>
      assert(epsE6 == 1000000L)
      // replay the draw: JVM md5 of the salted key, first 15 hex chars
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp13:$region".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val u = java.lang.Long.parseLong(hex, 16)
      val noise = ExtensionQueries.DpGeomCdf60.count(u >= _).toLong - 20L
      assert(noise >= -20L && noise <= 20L, s"$region noise $noise")
      assert(nNoisy == math.max(truth(region) + noise, 0L),
        s"$region: got $nNoisy true ${truth(region)} noise $noise")
    }
    // the mechanism genuinely perturbs at this seed (else the test is
    // blind to a noise term that silently became 0)
    assert(got.exists { case (r, nn, _) => nn != truth(r) })
  }

  test("b12 cohort LTV: cumulative is monotone, ages dense from 0, totals reconcile") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = SparkEntry.queries("b12_cohort_ltv")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      assert(got.nonEmpty, dir)
      got.groupBy(_._1).foreach { case (cohort, rs) =>
        val seq = rs.sortBy(_._2)
        // cumulative = running sum of the per-age revenue, strictly derived
        assert(seq.map(_._4).scanLeft(0L)(_ + _).tail.toSeq ==
          seq.map(_._5).toSeq, s"$dir $cohort")
        // fixed-point per-user LTV is the floor ratio of that cumsum
        seq.foreach { case (_, _, nu, _, cum, ltv) =>
          assert(ltv == (BigInt(1000000) * cum / nu).toLong, s"$dir $cohort")
        }
      }
      // total across cohorts' final cum equals all purchase revenue of
      // users that appear in some cohort (every user does, by first-seen)
      val dec = org.apache.spark.sql.types.DecimalType(12, 2)
      val total = graft.etl.Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .select((col("value").cast(dec) *
          org.apache.spark.sql.functions.lit(100)).cast("long").as("cents"))
        .collect().map(_.getLong(0)).sum
      val finals = got.groupBy(_._1).values.map(_.maxBy(_._2)._5).sum
      assert(finals == total, s"$dir: $finals vs $total")
    }
  }

  test("c29 water-fill: allocations sum EXACTLY to the budget; level law holds at two scales") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = SparkEntry.queries("c29_water_fill")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3), r.getLong(4), r.getLong(5)))
      assert(got.nonEmpty)
      val budget = got.head._5
      assert(budget == got.map(_._2).sum / 2, s"$dir budget pin")
      // the water-filling contract: exact budget exhaustion, never
      // over-allocation, shares as exact fixed-point floors
      assert(got.map(_._3).sum == budget, s"$dir sum(alloc) == budget")
      got.foreach { case (src, size, alloc, kept, _, shareE6) =>
        assert(alloc <= size && alloc >= 0, s"$dir $src bounds")
        assert(!kept || alloc == size, s"$dir $src kept-whole means whole")
        assert(shareE6 == (BigInt(1000000) * alloc / budget).toLong,
          s"$dir $src share")
      }
      // equal-level law: all cut sources sit within 1 token of one
      // common level, and no kept-whole source exceeds that level + 1
      val cut = got.filterNot(_._4).map(_._3)
      assert(cut.nonEmpty, s"$dir: budget < total forces a cut source")
      assert(cut.max - cut.min <= 1, s"$dir one water level")
      val kept = got.filter(_._4).map(_._2)
      if (kept.nonEmpty)
        assert(kept.max <= cut.min + 1, s"$dir level dominance")
      // independent replay of the prefix test selecting the capped set
      val sizes = got.map(t => (t._1, t._2)).sortBy(t => (t._2, t._1))
      val n = sizes.length
      val prefix = sizes.map(_._2).scanLeft(0L)(_ + _).tail
      val ks = (1 to n).filter(k =>
        sizes(k - 1)._2 * (n - k) + prefix(k - 1) <= budget)
      val kstar = if (ks.isEmpty) 0 else ks.max
      assert(kstar == got.count(_._4), s"$dir k*")
      assert(got.filter(_._4).map(_._1).toSet ==
        sizes.take(kstar).map(_._1).toSet, s"$dir capped set is the prefix")
    }
  }

  test("t25 code detection: features replay; fires on EXACTLY the fixture code block") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("t25_code_detect")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getBoolean(7))).toMap
    assert(got.nonEmpty)
    val kw = Set("def", "return", "import", "struct", "int", "elif", "void")
    val docsRaw = graft.etl.Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // the corpus = prose docs under their own ids ∪ the three cycled
    // code templates in the 2,000,000 block (DocFixtures.codeDocsOf)
    val codeRows = docsRaw.collect { case (id, _) if id % 13 == 0 =>
      val text = ((id / 13) % 3) match {
        case 0 => s"def f(x): { return (x * 13) + $id; } import os; " +
          "struct point { int v = 7; }"
        case 1 => s"struct node { int k = $id; " +
          "void set(int x) { k = (x <= 0) ? 0 : x; } };"
        case _ => "import sys ; def g(y): if (y > 0): return y ; " +
          s"elif (y < 0): return (0 - y) ; return $id"
      }
      (id + 2000000L) -> text
    }
    val corpus = docsRaw.toSeq ++ codeRows
    assert(got.size == corpus.size)
    // all three templates genuinely present at this scale
    assert(docsRaw.collect { case (id, _) if id % 13 == 0 =>
      (id / 13) % 3 }.toSet.size == 3)
    corpus.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val nSym = text.count("{}();=<>".contains(_)).toLong
      val nKw = toks.count(kw).toLong
      val symE6 = if (text.nonEmpty) 1000000L * nSym / text.length else 0L
      val kwE6 = if (toks.nonEmpty) 1000000L * nKw / toks.size else 0L
      val (gc, gt, gs, gk, gse, gke, gLike) = got(id)
      assert(gc == text.length && gt == toks.size, s"doc $id counts")
      assert(gs == nSym && gk == nKw, s"doc $id features")
      assert(gse == symE6 && gke == kwE6, s"doc $id ratios")
      assert(gLike == (symE6 >= 50000L && kwE6 >= 50000L), s"doc $id verdict")
      // the detector's contract on this corpus: fires on exactly the
      // fixture code block (every template), never on prose — including
      // the %13 base docs whose PROSE text is now also in the corpus
      assert(gLike == (id >= 2000000L && id < 3000000L), s"doc $id routing")
    }
    // both classes genuinely present, and the margins are real (no doc
    // sits ON a threshold — a fixture drift toward the boundary should
    // fail loudly here, not flake the hash)
    val (code, prose) = got.values.partition(_._7)
    assert(code.nonEmpty && prose.nonEmpty)
    code.foreach { c => assert(c._5 >= 60000L && c._6 >= 60000L) }
    prose.foreach { p => assert(p._5 < 40000L || p._6 < 40000L) }
  }

  test("b15 stationary: 20 fixed-point rounds replay in BigInt; iteration has converged") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("b15_markov_stationary")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.nonEmpty)
    // rebuild the chain from raw events, replay the exact integer
    // recurrence
    val ev = graft.etl.Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).map(_._4).toSeq.sliding(2)
        .collect { case Seq(a, b) => (a, b) }
    }.toSeq.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    val fromTot = trans.toSeq.groupBy(_._1._1)
      .map { case (f, ts) => f -> ts.map(_._2).sum }
    val SCALE = BigInt(1000000000000L)
    val p = trans.map { case ((f, t), n) =>
      (f, t) -> (BigInt(n) * SCALE / fromTot(f)) }
    val states = (trans.keys.map(_._1) ++ trans.keys.map(_._2)).toSet
    val targets = trans.keys.map(_._2).toSet
    var r: Map[String, BigInt] = states.map(_ -> SCALE).toMap
    var r19: Map[String, BigInt] = r
    for (k <- 1 to 20) {
      if (k == 20) r19 = r
      r = targets.map { t =>
        t -> p.collect { case ((f, t2), pe) if t2 == t =>
          r.getOrElse(f, BigInt(0)) * pe }.sum / SCALE
      }.toMap
    }
    // the query's output key set is the TARGET state set (each round
    // regroups on to_type)
    assert(got.keySet == targets)
    val tot = got.values.map(v => BigInt(v._1)).sum
    got.foreach { case (st, (v, share)) =>
      assert(BigInt(v) == r.getOrElse(st, BigInt(0)), s"$st v replay")
      assert(BigInt(share) == BigInt(1000000) * v / tot, s"$st share")
    }
    // convergence: round 20 moved each state by < 0.1% of SCALE vs
    // round 19 — the power iteration has genuinely settled
    targets.foreach { st =>
      val d = (r.getOrElse(st, BigInt(0)) - r19.getOrElse(st, BigInt(0))).abs
      assert(d * 1000 < SCALE, s"$st not converged: moved $d")
    }
    // floor leakage is bounded: total mass within 0.01% of |states|·SCALE
    assert((BigInt(states.size) * SCALE - tot).abs * 10000 <
      BigInt(states.size) * SCALE)
    // the chain is genuinely non-uniform on this fixture
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("b15 iterate: early-stop logic is cap-neutral (== plain 20 rounds); sink self-loop conserves mass") {
    val SCALE = BigInt(1000000000000L)
    // convergence-round evidence for the early stop (the r15 rewrite):
    // rebuild the fixture edge list exactly as the query's plan does
    // and run the shared recurrence — it must reach its exact integer
    // fixed point strictly before the oracle's 20-round cap, which is
    // what makes the early stop provably hash-neutral
    val dir = "/root/testdata/sf0.001"
    val ev = graft.etl.Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).map(_._4).toSeq.sliding(2)
        .collect { case Seq(a, b) => (a, b) }
    }.toSeq.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    val fromTot = trans.toSeq.groupBy(_._1._1)
      .map { case (f, ts) => f -> ts.map(_._2).sum }
    val edges = trans.toSeq.map { case ((f, t), n) =>
      (f, t, (BigInt(n) * SCALE / fromTot(f)).toLong) }
    val (vFix, rounds) = ExtensionQueries.markovStationaryIterate(edges)
    // the early stop fires ONLY at an exact integer fixed point — on
    // this fixture the chain still moves a few 10⁻¹² ulps at round 20
    // (the r14 spec's convergence bound is 0.1%, not exactness), so the
    // full 20 rounds run and the result is the oracle's by definition.
    // Pin cap-neutrality structurally: an explicit no-early-stop
    // 20-round replay must equal the helper's output bit-for-bit.
    assert(rounds == 20 || rounds > 1, s"ran $rounds")
    val SCALE2 = BigInt(1000000000000L)
    var vv: Map[String, BigInt] =
      ((edges.map(_._1) ++ edges.map(_._2)).distinct.map(_ -> SCALE2)).toMap
    for (_ <- 1 to 20) {
      val acc = scala.collection.mutable.Map.empty[String, BigInt]
      edges.foreach { case (f, t, pe) =>
        vv.get(f).foreach(m => acc(t) = acc.getOrElse(t, BigInt(0)) + m * pe)
      }
      vv = acc.map { case (t, sm) => t -> sm / SCALE2 }.toMap
    }
    assert(vFix == vv, "helper (with early-stop logic) != plain 20-round replay")
    // absorbing-sink convention (the r14 ADVICE item): C is
    // target-only; the injected self-loop retains its mass instead of
    // dropping it after round 1, so total mass is conserved up to the
    // per-target floor loss (< |states| ulps of 1e-12 per round)
    val sinkEdges = Seq(
      ("A", "B", 600000000000L), ("A", "C", 400000000000L),
      ("B", "A", SCALE.toLong))
    val (v2, r2) = ExtensionQueries.markovStationaryIterate(sinkEdges)
    assert(v2.keySet == Set("A", "B", "C"))
    val tot = v2.values.foldLeft(BigInt(0))(_ + _)
    val lost = BigInt(3) * SCALE - tot
    assert(lost >= 0 && lost < BigInt(3L * 20), s"mass lost $lost")
    // the chain drains into the absorbing state
    assert(v2("C") > v2("A") && v2("C") > v2("B"))
    assert(r2 <= 20)
  }

  test("c30 group split: zero near-dup pairs cross the split; per-doc hashing WOULD leak") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("c30_group_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got.nonEmpty)
    // every near-dup candidate pair (the SAME generator the clustering
    // consumed) must land on one side — the leakage-free contract
    val pairs = graft.ext.Dedup.ngramJaccardPairs(
      graft.ext.DocFixtures.docsNear(spark, dir), n = 7, threshold = 0.5)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(got(a)._1 == got(b)._1, s"pair ($a,$b) split across groups")
      assert(got(a)._2 == got(b)._2, s"pair ($a,$b) split across sides")
    }
    // group members inherit the group key's bucket — the c2 device on
    // the key, replayed
    def bucket(key: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
      val h2 = f"${md(0) & 0xff}%02x"
      if (h2 <= "28") "train" else if (h2 <= "3c") "valid" else "test"
    }
    got.foreach { case (id, (key, split)) =>
      assert(split == bucket(key), s"doc $id bucket replay")
      assert(key <= id, s"doc $id: group key is a cluster min-id")
    }
    // non-vacuity 1: all three sides are populated
    assert(got.values.map(_._2).toSet == Set("train", "valid", "test"))
    // non-vacuity 2: the per-DOC hash split (c2's device on doc_id)
    // WOULD place at least one near-dup pair on different sides — the
    // leak this operator exists to prevent is real on this fixture
    assert(pairs.exists { case (a, b) => bucket(a) != bucket(b) },
      "fixture never straddles — leakage property is vacuous")
  }

  test("c29 water-fill property: closed form == independent binary-search reference (ScalaCheck)") {
    // The query's one-pass closed form (capped set = prefix of the size
    // sort, level = (B−P_k*)/(n−k*), remainder by name order) is proved
    // equivalent to a SECOND, independently-derived algorithm: binary
    // search the largest integer level L with Σ min(size, L) ≤ B, base
    // everyone at min(size, L), then hand the leftover +1s to the
    // size > L sources in name order. The two agree because no integer
    // size can sit strictly between floor(L_exact) and L_exact — so the
    // closed form's capped set is exactly {size ≤ floor}. ScalaCheck
    // hunts the boundary cases (ties at the level, zero sizes, budget 0,
    // single source) and shrinks any failure to a minimal fixture.
    // Pure JVM — hundreds of cases cost nothing.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def closedForm(sized: Seq[(String, Long)], b: Long): Map[String, Long] = {
      val s = sized.sortBy(t => (t._2, t._1))
      val n = s.length
      val prefix = s.map(_._2).scanLeft(0L)(_ + _).tail
      val ks = (1 to n).filter(k =>
        s(k - 1)._2 * (n - k) + prefix(k - 1) <= b)
      val kstar = if (ks.isEmpty) 0 else ks.max
      val pstar = if (kstar == 0) 0L else prefix(kstar - 1)
      val lden = n - kstar
      val lnum = b - pstar
      val floorL = if (lden == 0) 0L else lnum / lden
      val rem = if (lden == 0) 0L else lnum - floorL * lden
      val capped = s.take(kstar).map(t => t._1 -> t._2)
      val uncapped = s.drop(kstar).map(_._1).sorted.zipWithIndex
        .map { case (name, i) => name -> (floorL + (if (i < rem) 1L else 0L)) }
      (capped ++ uncapped).toMap
    }
    def reference(sized: Seq[(String, Long)], b: Long): Map[String, Long] = {
      // binary search the largest L with Σ min(size, L) ≤ b
      def filled(l: Long) = sized.map(t => math.min(t._2, l)).sum
      var lo = 0L; var hi = sized.map(_._2).foldLeft(0L)(math.max)
      while (lo < hi) {
        val mid = lo + (hi - lo + 1) / 2
        if (filled(mid) <= b) lo = mid else hi = mid - 1
      }
      val base = sized.map { case (nm, sz) => nm -> math.min(sz, lo) }.toMap
      var leftover = b - filled(lo)
      val out = collection.mutable.Map(base.toSeq: _*)
      sized.filter(_._2 > lo).map(_._1).sorted.foreach { nm =>
        if (leftover > 0) { out(nm) = out(nm) + 1; leftover -= 1 }
      }
      out.toMap
    }
    val genSources = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose('a', 'z').map(_.toString), Gen.choose(0L, 50L)))
      .map(_.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }.toSeq)
    val prop = Prop.forAll(genSources, Gen.choose(0L, 1000L)) { (src, bRaw) =>
      val total = src.map(_._2).sum
      val b = if (total == 0) 0L else bRaw % total // query contract: B < total
      val cf = closedForm(src, b)
      val rf = reference(src, b)
      val sumOk = cf.values.sum == b
      val boundsOk = src.forall { case (nm, sz) => cf(nm) >= 0 && cf(nm) <= sz }
      cf == rf && sumOk && boundsOk
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500)
      .withInitialSeed(org.scalacheck.rng.Seed(1337L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("t24 vocab growth: first-occurrence replay; curve totals close exactly") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("t24_vocab_growth")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val docsRaw = graft.etl.Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toks = docsRaw.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val width = docsRaw.map(_._1).max / 16 + 1
    val firstDoc = collection.mutable.Map[String, Long]()
    toks.sortBy(_._1).foreach { case (id, ws) =>
      ws.foreach(w => if (!firstDoc.contains(w)) firstDoc(w) = id) }
    val expDocs = toks.groupBy(_._1 / width)
      .map { case (b, xs) => b -> (xs.length.toLong, xs.map(_._2.length.toLong).sum) }
    val expTypes = firstDoc.values.groupBy(_ / width)
      .map { case (b, xs) => b -> xs.size.toLong }
    assert(got.keySet == expDocs.keySet)
    var (dc, tc, yc) = (0L, 0L, 0L)
    got.toSeq.sortBy(_._1).foreach { case (b, (nd, ntk, nty, dcu, tcu, ycu)) =>
      assert((nd, ntk) == expDocs(b), s"bucket $b doc/token mass")
      assert(nty == expTypes.getOrElse(b, 0L), s"bucket $b new types")
      dc += nd; tc += ntk; yc += nty
      assert((dcu, tcu, ycu) == ((dc, tc, yc)), s"bucket $b cumsums")
    }
    // the curve closes on the exact corpus totals
    assert(dc == docsRaw.length.toLong && yc == firstDoc.size.toLong)
    assert(tc == toks.map(_._2.length.toLong).sum)
    // a bounded-vocabulary fixture front-loads type minting: bucket 0
    // mints at least as many types as any later bucket
    val nt0 = got(got.keySet.min)._3
    assert(got.values.forall(_._3 <= nt0))
  }

  test("short-doc fixture: sub-shingle-width docs feed tiers, never positions or pairs") {
    // the r13 t22 fix (filter docs < shingle width BEFORE exploding)
    // predated any fixture exercising it; since r14 the 2-token and
    // 1-token injections (DocFixtures.shortDocs) pin the class by data
    // at both gate scales
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // t22: a doc with < 3 tokens has no trigram position, so the short
      // docs must be ABSENT from the output (pre-fix they would have
      // injected whole-doc pseudo-shingles into the contested tier
      // boundary instead)
      val t22 = SparkEntry.queries("t22_trigram_coverage")(spark, dir)
        .collect().map(_.getLong(0))
      assert(t22.nonEmpty && !t22.exists(_ >= 3000000L),
        s"$dir: short docs leaked into t22 positions")
      // ...while their unigrams DO reach the vocab tier build: "alpha"
      // appears in both injected docs (count 2 >= the vocab floor),
      // "beta" in one (excluded) -- the tier tables see the short docs
      // even though the position table never does
      val vocab = graft.ext.DocFixtures.docsShort(spark, dir)
        .select(org.apache.spark.sql.functions.explode(
          graft.ext.TextAnalysis.tokens(
            org.apache.spark.sql.functions.col("text"))).as("w"))
        .groupBy("w").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(vocab("alpha") == 2L && vocab("beta") == 1L)
      // d2: the short docs' whole-doc pseudo-shingles match no other
      // doc, so no phantom near-dup pair reaches the output
      val d2 = SparkEntry.queries("d2_ngram_jaccard")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(d2.nonEmpty &&
        !d2.exists(p => p._1 >= 3000000L || p._2 >= 3000000L),
        s"$dir: phantom short-doc pair in d2")
    }
  }

  test("c31 systematic sample: exactly k picks; selection and stride indexes replay") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("c31_systematic_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val k = 100L
    val w = graft.etl.Tables.table(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> math.min(r.getLong(1), 400L))
      .sortBy(_._1)
    val tw = w.map(_._2).sum
    // exact-size precondition on this fixture: no doc outweighs a stride
    assert(w.map(_._2).max < tw / k,
      "fixture violates w_max < W/k — the exactly-k contract's premise")
    // replay the boundary-containment rule over the true prefix sum
    var cum = 0L
    val want = w.flatMap { case (id, wi) =>
      cum += wi
      val hi = cum * k / tw
      val lo = (cum - wi) * k / tw
      if (hi > lo) Some((id, wi, cum, hi)) else None
    }
    assert(got.toSeq == want.toSeq)
    // exactly k picks, stride indexes strictly increasing in 1..k
    assert(got.length == k.toInt, s"got ${got.length} picks")
    assert(got.map(_._4).toSeq == got.map(_._4).sorted.toSeq)
    assert(got.map(_._4).distinct.length == got.length)
    assert(got.head._4 >= 1L && got.last._4 <= k)
    // weight-proportional in aggregate: picked docs average heavier
    // than the corpus (the fixture has genuine weight spread)
    val avgAll = tw.toDouble / w.length
    val avgPick = got.map(_._2).sum.toDouble / got.length
    assert(avgPick > avgAll, f"picked avg $avgPick%.1f !> corpus $avgAll%.1f")
  }

  test("x14 table checksum: order-free register replays; single-row corruption flips it") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("x14_table_checksum")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.nonEmpty)
    val rows = graft.etl.Pipelines.cleanSales(spark, dir)
      .selectExpr("category",
        """concat_ws('|', cast(order_id as string),
          |cast(line_id as string), cast(product_id as string),
          |cast(quantity as string),
          |cast(cast(cast(unit_price as decimal(12,2)) * 100 as long)
          |  as string),
          |cast(order_date as string),
          |cast(customer_id as string))""".stripMargin.replace("\n", " "))
      .collect().map(r => r.getString(0) -> r.getString(1))
    def h60(s: String): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
      // first 15 hex chars = first 7.5 bytes
      BigInt(md.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val MOD = BigInt("1000000000000000000")
    val want = rows.groupBy(_._1).map { case (cat, rs) =>
      cat -> (rs.length.toLong,
        (rs.map(r => h60(r._2)).sum % MOD).toLong)
    }
    assert(got == want)
    // order independence is structural (SUM is commutative); corruption
    // sensitivity is the property worth paying for: flip ONE row's
    // serialization and the register must move
    val (cat0, rs0) = rows.groupBy(_._1).head
    val corrupted = rs0.zipWithIndex.map { case ((_, s), i) =>
      if (i == 0) s + "X" else s }
    val sumC = (corrupted.map(h60).sum % MOD).toLong
    assert(sumC != got(cat0)._2, "corrupted row did not move the register")
  }
}
