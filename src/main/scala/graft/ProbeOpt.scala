package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only optimization profiler (round-17): per-stage wall times for the
  * top-cost bench queries, so optimization targets the measured stage
  * rather than the guess (guide §1). Not part of the driver contract.
  *
  * Usage: runMain graft.ProbeOpt <sfDir> [family...]
  * Families: minhash, cc, pq, ivf, q21, agree, recall
  */
object ProbeOpt {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val fams = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    def want(f: String): Boolean = fams.isEmpty || fams(f)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tm[A](tag: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime; val r = f
      println(f"[$tag] ${(System.nanoTime - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Per-job wall-time attribution for one action — the ONE listener
    // scaffold (the jobs/pqjobs families shared two hand-synced copies
    // until the r17 review wave); the listener detaches in a finally so
    // a failing action cannot leave it double-counting later families.
    def jobTimes(tag: String)(action: => Unit): Unit = {
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val lines = new java.util.concurrent.CopyOnWriteArrayList[String]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(js.jobId, js.time)
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobs.getOrDefault(je.jobId, je.time)
          lines.add(f"  job ${je.jobId}%4d  ${(je.time - t0) / 1e3}%6.2f s")
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime
      try action
      finally spark.sparkContext.removeSparkListener(listener)
      val total = (System.nanoTime - t0) / 1e9
      Thread.sleep(300) // let trailing JobEnd events drain
      println(s"[$tag jobs]")
      lines.forEach(l => println(l))
      println(f"[$tag total] $total%.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // Warm the tables + codegen once so stage times aren't first-run JIT.
    docs.count(); emb.count()

    import graft.operators.{Barrier, Dedup, Similarity}
    import graft.operators.Barrier.BarrierOps

    if (want("minhash")) {
      // Stage split of the minhashNearDups chain (shared by 6 queries).
      tm("mh:whole-query-warm") { noop(Dedup.minhashNearDups(docs)) }
      tm("mh:whole-query") { noop(Dedup.minhashNearDups(docs)) }
      val f = docs.where(col("doc_id").isNotNull)
      val sets = tm("mh:sets-barrier") { Dedup.shingleSets(f, 3).barrier() }
      tm("mh:signatures") {
        noop(Dedup.signaturesFromExploded(Dedup.explodedFromSets(sets)))
      }
      val bk = tm("mh:buckets-barrier") {
        Dedup.bandBucketsFromSignatures(
          Dedup.signaturesFromExploded(Dedup.explodedFromSets(sets)))
          .barrier()
      }
      tm("mh:cand-join") {
        val l = bk.as("l"); val r = bk.as("r")
        noop(l.join(r,
          col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
          .distinct())
      }
      tm("mh:verify") {
        val p = Dedup.verifiedLshPairs(sets, bk, 0.5,
          bucketsMaterialized = true)
        Barrier.release(p)
      }
      Barrier.release(bk); Barrier.release(sets)
    }

    if (want("mh2")) {
      // Candidate rewrite: per-row band keys via the spec-pinned
      // bandKeyArray kernel (map-only — no signature exchange, no
      // shingle-row explode) vs the batch explode+agg pipeline.
      val f = docs.where(col("doc_id").isNotNull)
      val sets = Dedup.shingleSets(f, 3).barrier()
      tm("mh2:buckets-batch") {
        noop(Dedup.bandBucketsFromSignatures(
          Dedup.signaturesFromExploded(Dedup.explodedFromSets(sets))))
      }
      // The per-row side measures the SHIPPED operator (the original
      // exploration used an inner posexplode + a size(sset) pre-filter
      // — exactly the two trap forms bandBucketsFromSets documents
      // avoiding; re-deriving the r17 numbers must measure the real
      // thing, review-wave finding).
      tm("mh2:buckets-perrow-warm") {
        noop(Dedup.bandBucketsFromSets(sets))
      }
      tm("mh2:buckets-perrow") { noop(Dedup.bandBucketsFromSets(sets)) }
      // Equality probe: same (doc_id, band, key) multiset?
      val a = Dedup.bandBucketsFromSignatures(
        Dedup.signaturesFromExploded(Dedup.explodedFromSets(sets)))
      val b = Dedup.bandBucketsFromSets(sets)
      println("batch-only rows: " + a.exceptAll(b).count() +
        "  perrow-only rows: " + b.exceptAll(a).count())
      Barrier.release(sets)
    }

    if (want("pq2")) {
      // Candidate rewrite probe: interpreted zip_with+aggregate ADC sum
      // vs a static sum of element_at lookups (m known at plan time).
      val m = 4; val codes = 8
      val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("ev"))
      val dims = v.select(size(col("ev"))).head().getInt(0)
      val sub = dims / m
      // Fake books (first `codes` vectors' slices) — same expression
      // SHAPE as the trained ones, probe-only.
      val seed = v.filter(col("vec_id") < codes).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Double](1).toArray)
      def sliceArr(a: Array[Double], j: Int) =
        a.slice(j * sub, (j + 1) * sub)
      import graft.operators.Similarity.dot
      def codeExpr(j: Int): Column = {
        val xs = slice(col("ev"), j * sub + 1, sub)
        val xx = dot(xs, xs)
        array_min(array((0 until codes).map { c =>
          val cl = typedlit(sliceArr(seed(c), j))
          struct(((xx + dot(cl, cl)) - lit(2.0) * dot(xs, cl)).as("d2"),
            lit(c).as("code"))
        }: _*))("code")
      }
      def lutExpr(j: Int): Column = {
        val qs = slice(col("ev"), j * sub + 1, sub)
        val qq = dot(qs, qs)
        array((0 until codes).map { c =>
          val cl = typedlit(sliceArr(seed(c), j))
          floor(((qq + dot(cl, cl)) - lit(2.0) * dot(qs, cl)) * lit(1e6))
            .cast("long")
        }: _*)
      }
      val encoded = v.select(col("vec_id"),
        array((0 until m).map(codeExpr): _*).as("codes"))
      val queries = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          array((0 until m).map(lutExpr): _*).as("luts"))
      def scoredHof = encoded
        .join(broadcast(queries), col("query_id") =!= col("vec_id"))
        .withColumn("adist_us",
          aggregate(zip_with(col("codes"), col("luts"),
            (c, l) => element_at(l, c + 1)), lit(0L), (acc, x) => acc + x))
        .select(col("query_id"), col("vec_id"), col("adist_us"))
      def scoredStatic = encoded
        .join(broadcast(queries), col("query_id") =!= col("vec_id"))
        .withColumn("adist_us",
          (0 until m).map(j =>
            element_at(col("luts")(j), col("codes")(j) + 1))
            .reduce(_ + _))
        .select(col("query_id"), col("vec_id"), col("adist_us"))
      tm("pq2:hof-warm") { noop(scoredHof) }
      tm("pq2:hof") { noop(scoredHof) }
      tm("pq2:static-warm") { noop(scoredStatic) }
      tm("pq2:static") { noop(scoredStatic) }
      println("diff rows: " + scoredHof.exceptAll(scoredStatic).count())
      // Finer attribution of the scoring job.
      tm("pq2:encode-only-warm") { noop(encoded) }
      tm("pq2:encode-only") { noop(encoded) }
      tm("pq2:queries-only") { noop(queries) }
      tm("pq2:join-no-sum") {
        noop(encoded.join(broadcast(queries),
          col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id")))
      }
      val encB = encoded.barrier()
      tm("pq2:join-static-from-barrier") {
        noop(encB.join(broadcast(queries),
          col("query_id") =!= col("vec_id"))
          .withColumn("adist_us",
            (0 until m).map(j =>
              element_at(col("luts")(j), col("codes")(j) + 1))
              .reduce(_ + _))
          .select(col("query_id"), col("vec_id"), col("adist_us")))
      }
      Barrier.release(encB)
      println("---- fused executed plan (WSCG spans) ----")
      println(scoredStatic.queryExecution.executedPlan.treeString
        .split("\n").filterNot(_.contains("vec_dot")).take(25).mkString("\n"))
      // Conf experiments restore in a finally (the cc family's
      // sys.props discipline): a failure here must not leave later
      // families measuring under the wrong codegen regime.
      try {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        tm("pq2:static-no-wscg-warm") { noop(scoredStatic) }
        tm("pq2:static-no-wscg") { noop(scoredStatic) }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      try {
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
        tm("pq2:static-hml8000-warm") { noop(scoredStatic) }
        tm("pq2:static-hml8000") { noop(scoredStatic) }
      } finally spark.conf.unset("spark.sql.codegen.hugeMethodLimit")
    }

    if (want("cc")) {
      sys.props("graft.debug") = "1"
      try {
        tm("cc:clusters-total-warm") { noop(Dedup.minhashClusters(docs)) }
        tm("cc:clusters-total") { noop(Dedup.minhashClusters(docs)) }
        val pairs = Dedup.minhashNearDups(docs)
        tm("cc:dupClusters-only") {
          noop(Dedup.dupClusters(docs.select(col("doc_id")), pairs))
        }
        Barrier.release(pairs)
        tm("cc:keep-best-total") { noop(Dedup.minhashKeepBest(docs)) }
        tm("cc:soft-dedup-total") { noop(Dedup.minhashSoftDedup(docs)) }
      } finally sys.props.remove("graft.debug")
    }

    if (want("pq")) {
      tm("pq:topk-warm") { noop(Similarity.pqTopK(emb)) }
      tm("pq:topk") { noop(Similarity.pqTopK(emb)) }
      tm("pq:recall") { noop(Similarity.pqRecall(emb)) }
      // Training-only cost: iters=0 vs default 2 isolates the Lloyd's
      // loop from the encode/score tail (iters=0 skips iteration scans).
      tm("pq:topk-iters0") { noop(Similarity.pqTopK(emb, iters = 0)) }
      tm("pq:brute-force") { noop(Similarity.bruteForceTopK(emb, 5, 10)) }
    }

    if (want("ivf")) {
      tm("ivf:kmeans-topk-warm") { noop(Similarity.ivfKmeansTopK(emb)) }
      tm("ivf:kmeans-topk") { noop(Similarity.ivfKmeansTopK(emb)) }
      tm("ivf:kmeans-iter") { noop(Similarity.kmeansIterate(emb)) }
      tm("ivf:recall") { noop(Similarity.ivfRecall(emb)) }
      tm("ivf:cluster-purity") { noop(Similarity.clusterPurity(emb)) }
    }

    if (fams.contains("bq")) {
      // Bench-style min-of-2 for the named registered queries (args
      // after "bq"): the per-query iteration loop without the full
      // suite. Warm pass first (codegen), then two timed passes.
      val names = args.drop(1).filterNot(_ == "bq")
      for (nm <- names; fn <- SparkEntry.queries.get(nm)) {
        // Warm pass doubles as the failure gate: a deterministically
        // failing query must not abort the rest of the run (the timed
        // passes below only run when the warm pass survived).
        val warmOk =
          try { noop(fn(spark, sfDir)); true }
          catch { case scala.util.control.NonFatal(e) =>
            println(s"[$nm] FAILED: ${e.getMessage}"); false }
        if (warmOk) {
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime
            noop(fn(spark, sfDir))
            (System.nanoTime - t0) / 1e9
          }
          println(f"[$nm] min=${times.min}%.2f s  " +
            s"(${times.map(t => f"$t%.2f").mkString(", ")})")
        }
      }
    }

    if (fams.contains("plans17")) {
      // Formatted plans of the r17-touched builders that eager result
      // barriers hide from the registered queries' own plans (the
      // kmeansSearchPlan discipline) — written to plans/r17/.
      import org.apache.spark.sql.execution.FormattedMode
      def dump(name: String, df: DataFrame): Unit = {
        val p = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"plans/r17/$name.txt"),
          p.getBytes("UTF-8"))
        println(s"wrote plans/r17/$name.txt")
      }
      val sets = Dedup.shingleSets(docs.where(col("doc_id").isNotNull), 3)
      dump("bandbuckets_after", Dedup.bandBucketsFromSets(sets))
      val encoded = emb.select(col("vec_id"),
        array((col("vec_id") % 8).cast("int"),
          (col("vec_id") % 5).cast("int")).as("codes"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          array(array((0 until 8).map(i => lit(i.toLong)): _*),
            array((0 until 8).map(i => lit(i * 2L)): _*)).as("luts"))
      dump("pq_serve_tail_after", Similarity.pqTopKTail(
        Similarity.adcScoreJoin(encoded, queries), 5))
    }

    if (want("gq")) {
      // Which expression family dominates doc_gopher_quality's single
      // 1.48 s map job? Time the derived projection piecewise over a
      // materialized (doc_id, chars, toks) table.
      import graft.operators.Curation
      val toksTab = docs.select(col("doc_id"),
        length(col("text")).as("chars"),
        graft.operators.TextAnalysis.wsTokens(col("text")).as("toks"))
        .barrier()
      def sortedGrams(n: Int): Column =
        when(size(col("toks")) >= n,
          sort_array(graft.operators.TextAnalysis.ngramArray(col("toks"), n)))
          .otherwise(array().cast("array<string>"))
      def topFold(grams: Column): Column = {
        val zeroState = struct(lit("").as("prev"), lit(0L).as("run"),
          lit(0L).as("best"), lit("").as("bestg"))
        aggregate(grams, zeroState,
          (st, g) => {
            val nrun = when(g === st("prev"), st("run") + 1).otherwise(lit(1L))
            struct(g.as("prev"), nrun.as("run"),
              when(nrun > st("best"), nrun).otherwise(st("best")).as("best"),
              when(nrun > st("best"), g).otherwise(st("bestg")).as("bestg"))
          })
      }
      tm("gq:full-warm") { noop(Curation.gopherQuality(docs)) }
      tm("gq:full") { noop(Curation.gopherQuality(docs)) }
      tm("gq:tokenize-only") { noop(toksTab.sparkSession.emptyDataFrame) }
      tm("gq:toks-barrier-scan") { noop(toksTab) }
      for (n <- Seq(2, 3, 4)) {
        val d = toksTab.select(col("doc_id"), sortedGrams(n).as("g"))
        tm(s"gq:grams$n-sorted") { noop(d) }
        tm(s"gq:grams$n-fold") {
          noop(d.select(col("doc_id"), topFold(col("g")).as("t")))
        }
      }
      tm("gq:stop-hits") {
        val lt = toksTab.select(col("doc_id"),
          transform(col("toks"), t => lower(t)).as("ltoks"))
        noop(lt.select(col("doc_id"),
          Curation.gopherStopwords
            .map(s => when(array_contains(col("ltoks"), s), 1).otherwise(0))
            .reduce(_ + _).as("sh")))
      }
      tm("gq:mwl-dr") {
        noop(toksTab.select(col("doc_id"),
          graft.operators.TextAnalysis.meanTokenLenFromToks(col("toks")).as("m"),
          when(size(col("toks")) === 0, 0.0).otherwise(
            size(array_distinct(col("toks"))).cast("double") /
              size(col("toks")).cast("double")).as("dr")))
      }
      tm("gq:dlf-chunks") {
        val ch = toksTab.select(col("doc_id"),
          when(size(col("toks")) === 0, array().cast("array<string>"))
            .otherwise(transform(
              graft.operators.TextAnalysis.chunkStructs(col("toks"), 10),
              s => s("chunk"))).as("chunks"))
        noop(ch.select(col("doc_id"),
          when(size(col("chunks")) === 0, 0.0).otherwise(
            (size(col("chunks")) - size(array_distinct(col("chunks"))))
              .cast("double") / size(col("chunks")).cast("double")).as("dlf")))
      }
      graft.operators.Barrier.release(toksTab)
    }

    if (fams.contains("plans18")) {
      // Formatted plans of the r18-touched builders that eager result
      // barriers hide from the registered queries' own plans (the
      // kmeansSearchPlan discipline) — written to plans/r18/.
      import org.apache.spark.sql.execution.FormattedMode
      def dump(name: String, df: DataFrame): Unit = {
        val p = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"plans/r18/$name.txt"),
          p.getBytes("UTF-8"))
        println(s"wrote plans/r18/$name.txt")
      }
      val sets = Dedup.shingleSets(docs.where(col("doc_id").isNotNull), 3)
      dump("bandbuckets_kernel_after", Dedup.bandBucketsFromSets(sets))
      dump("simhash64_signatures_after", Dedup.simhashes64(docs))
      dump("gopher_quality_kernel_after",
        graft.operators.Curation.gopherQuality(docs))
      dump("winnow_fingerprints_kernel_after",
        graft.operators.TextAnalysis.winnowingFingerprints(docs))
    }

    if (want("pmi")) {
      // Is the corpus-sized docBigrams cache in pmiTopK load-bearing?
      // pmiTail's ONLY direct consumer of d is c2 = groupBy(w1,w2); the
      // margins/total all derive from c2, whose four exchanges are
      // structurally identical — if ReuseExchange collapses them, a
      // pair-vocab-sized c2 barrier beats caching the corpus-sized d.
      import graft.operators.TextAnalysis
      val q = SparkEntry.queries("doc_pmi_topk")
      tm("pmi:reg-warm") { noop(q(spark, sfDir)) }
      tm("pmi:reg") { noop(q(spark, sfDir)) }
      val dRaw = TextAnalysis.docBigrams(docs)
      val tailA = TextAnalysis.pmiTail(
        TextAnalysis.pairCounts(dRaw, "c_xy"), 20, 5L)
      val planA = tailA.queryExecution.executedPlan.toString
      println("pmi:nocache Exchange count = " +
        "Exchange".r.findAllIn(planA).length +
        ", ReusedExchange count = " +
        "ReusedExchange".r.findAllIn(planA).length)
      tm("pmi:nocache-warm") { noop(tailA) }
      tm("pmi:nocache") { noop(tailA) }
      // Variant B: barrier the pair-vocab-sized c2 instead of caching d.
      def tailFromC2(): DataFrame = {
        val c2 = Barrier(dRaw.groupBy(col("w1"), col("w2"))
          .agg(sum(col("cnt")).as("c_xy")))
        try {
          val cx = c2.groupBy(col("w1")).agg(sum(col("c_xy")).as("c_x"))
          val cy = c2.groupBy(col("w2")).agg(sum(col("c_xy")).as("c_y"))
          val mm = c2.agg(sum(col("c_xy")).as("m"))
          c2.where(col("c_xy") >= 5L)
            .join(cx, Seq("w1")).join(cy, Seq("w2"))
            .crossJoin(broadcast(mm))
            .withColumn("score_ppm",
              expr("CAST(c_xy AS DECIMAL(38,0)) * m * 1000000 div " +
                "(CAST(c_x AS DECIMAL(38,0)) * c_y)"))
            .select(col("w1"), col("w2"), col("c_xy"), col("c_x"),
              col("c_y"), col("score_ppm"))
            .orderBy(col("score_ppm").desc, col("w1").asc, col("w2").asc)
            .limit(20).barrier()
        } finally Barrier.release(c2)
      }
      tm("pmi:c2barrier-warm") { noop(tailFromC2()) }
      tm("pmi:c2barrier") { noop(tailFromC2()) }
    }

    if (want("lm")) {
      // Same cache-vs-kernel-recompute rebalance probe for the LM chain:
      // d feeds the model aggregation AND the scoring join (2 consumers).
      // Variant: barrier the pair-vocab c2 (model side reads it; d's
      // pipeline runs once into the barrier + once under the scoring
      // join) instead of caching the corpus-sized d.
      import graft.operators.TextAnalysis
      val q = SparkEntry.queries("doc_bigram_lm")
      tm("lm:reg-warm") { noop(q(spark, sfDir)) }
      tm("lm:reg") { noop(q(spark, sfDir)) }
      val fdocs = docs.where(col("doc_id").isNotNull)
      def lmC2(): DataFrame = {
        val dRaw = TextAnalysis.docBigrams(fdocs)
        val c2 = Barrier(dRaw.groupBy(col("w1"), col("w2"))
          .agg(sum(col("cnt")).as("c2")))
        try {
          val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
          val v = c1.agg(count(lit(1)).as("v"))
          val model = c2.join(c1, Seq("w1")).crossJoin(broadcast(v))
          val perDoc = dRaw.join(model, Seq("w1", "w2"))
            .withColumn("micro",
              expr("((c2 + 1L) * 1000000L) div (c1 + v)"))
            .groupBy(col("doc_id"))
            .agg(sum(col("cnt")).as("n_bigrams"),
              expr("sum(micro * cnt) div sum(cnt)").as("lm_micro"))
          fdocs.select(col("doc_id"))
            .join(perDoc, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
              coalesce(col("lm_micro"), lit(0L)).as("lm_micro"))
            .barrier()
        } finally Barrier.release(c2)
      }
      tm("lm:c2barrier-warm") { noop(lmC2()) }
      tm("lm:c2barrier") { noop(lmC2()) }
      val qa = SparkEntry.queries("doc_score_agreement")
      tm("lm:agree-warm") { noop(qa(spark, sfDir)) }
      tm("lm:agree") { noop(qa(spark, sfDir)) }
    }

    if (want("pqr")) {
      // pqRecall leg split: how much of the serve is the serial
      // brute-force leg a side driver thread could absorb (§2.6)?
      tm("pqr:recall-warm") { noop(Similarity.pqRecall(emb)) }
      tm("pqr:recall") { noop(Similarity.pqRecall(emb)) }
      jobTimes("pqr:recall-jobs") { noop(Similarity.pqRecall(emb)) }
    }

    if (want("rar")) {
      // Cache-vs-kernel-recompute rebalance probe for the token-frequency
      // pair (tokenRarity / tfIdfTopTerms): OLD = persist the corpus-
      // sized toks/tf table for its 2 consumers; NEW = barrier only the
      // vocab-sized freq/df table and recompute the kernel pipeline once
      // per consumer.
      import graft.operators.{TextAnalysis, Quant}
      val idDocs = docs.where(col("doc_id").isNotNull)
      def rarityTail(toks: DataFrame, freq: DataFrame): DataFrame = {
        val perDoc = toks.join(freq, Seq("token"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("freq")).as("freq_sum"),
            min(col("freq")).as("min_freq"),
            count(when(col("freq") === 1L, lit(1))).as("hapax"))
        idDocs.select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(Quant.q6(col("freq_sum").cast("double") /
              col("n_tokens").cast("double")), lit(0.0)).as("mean_freq"),
            coalesce(col("min_freq"), lit(0L)).as("min_freq"),
            coalesce(Quant.q6(col("hapax").cast("double") /
              col("n_tokens").cast("double")), lit(0.0)).as("hapax_share"))
      }
      def rarityOld(): DataFrame =
        Barrier.withCached(TextAnalysis.explodedTokens(idDocs)) { toks =>
          rarityTail(toks,
            toks.groupBy(col("token")).agg(count(lit(1)).as("freq")))
            .barrier()
        }
      def rarityNew(): DataFrame = {
        val toks = TextAnalysis.explodedTokens(idDocs)
        val freq = Barrier(
          toks.groupBy(col("token")).agg(count(lit(1)).as("freq")))
        try rarityTail(toks, freq).barrier()
        finally Barrier.release(freq)
      }
      tm("rar:old-warm") { noop(rarityOld()) }
      tm("rar:old") { noop(rarityOld()) }
      tm("rar:new-warm") { noop(rarityNew()) }
      tm("rar:new") { noop(rarityNew()) }
      def tfidfTail(tf: DataFrame, df: DataFrame): DataFrame = {
        val n = idDocs.agg(count_distinct(col("doc_id")).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token").asc)
        tf.join(df, Seq("token"))
          .join(broadcast(n))
          .withColumn("score",
            (col("tf").cast("double") * col("n").cast("double"))
              / col("df").cast("double"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("token"), col("tf"), col("df"),
            col("score"), col("rank").cast("long").as("rank"))
      }
      def tfOf(): DataFrame = TextAnalysis.explodedTokens(idDocs)
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      def tfidfOld(): DataFrame =
        Barrier.withCached(tfOf()) { tf =>
          tfidfTail(tf,
            tf.groupBy(col("token")).agg(count(lit(1)).as("df"))).barrier()
        }
      def tfidfNew(): DataFrame = {
        val tf = tfOf()
        val df = Barrier(
          tf.groupBy(col("token")).agg(count(lit(1)).as("df")))
        try tfidfTail(tf, df).barrier()
        finally Barrier.release(df)
      }
      tm("tfidf:old-warm") { noop(tfidfOld()) }
      tm("tfidf:old") { noop(tfidfOld()) }
      tm("tfidf:new-warm") { noop(tfidfNew()) }
      tm("tfidf:new") { noop(tfidfNew()) }
    }

    if (want("bm")) {
      // bm25TopK postings-cache rebalance probe: the tail reads the
      // postings 4 ways (qterms sliver, df sliver, totals fold, scoring
      // join). OLD = persist the corpus-sized postings; NEW = no cache
      // (each consumer re-runs kernel tokenize + the postings exchange).
      import graft.operators.Search
      val ids = Seq(3L, 5L, 9L, 11L, 17L)
      def bmOld(): DataFrame = Search.bm25TopK(docs, ids)
      def bmNew(): DataFrame = {
        import graft.operators.Barrier.BarrierOps
        Search.bm25Tail(Search.postings(docs), ids, 6, 10, 1.2, 0.75)
          .barrier()
      }
      tm("bm:old-warm") { noop(bmOld()) }
      tm("bm:old") { noop(bmOld()) }
      tm("bm:new-warm") { noop(bmNew()) }
      tm("bm:new") { noop(bmNew()) }
    }

    if (want("ng")) {
      // Shingle-set cache rebalance probe: containment reads the cached
      // sets 4 ways (self-join both sides + counts twice), minhash 3
      // ways (banding + verify-join both sides). NEW = no cache, the
      // kernel shingle pipeline re-runs per consumer.
      import graft.operators.{Dedup, Quant}
      val f = docs.where(col("doc_id").isNotNull)
      def contOver(sets: DataFrame): DataFrame = {
        val ex = sets.select(col("doc_id"), explode(col("sset")).as("shingle"))
          .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
        val counts = sets.select(col("doc_id"), size(col("sset")).as("cnt"))
        val inter = ex.as("a").join(ex.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
          .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
          .withColumn("containment",
            Quant.r6(col("inter").cast("double") /
              least(col("ca.cnt"), col("cb.cnt")).cast("double")))
          .filter(col("containment") >= 0.6)
          .select(col("doc_a"), col("doc_b"),
            col("inter").cast("long").as("inter"), col("containment"))
      }
      def contOld(): DataFrame =
        Barrier.withCached(Dedup.shingleSets(f, 3)) { sets =>
          contOver(sets).barrier()
        }
      def contNew(): DataFrame = contOver(Dedup.shingleSets(f, 3)).barrier()
      tm("ng:cont-old-warm") { noop(contOld()) }
      tm("ng:cont-old") { noop(contOld()) }
      tm("ng:cont-new-warm") { noop(contNew()) }
      tm("ng:cont-new") { noop(contNew()) }
      def mhOld(): DataFrame = Dedup.minhashNearDups(docs)
      def mhNew(): DataFrame =
        Dedup.minhashNearDupsFromSets(Dedup.shingleSets(f, 3))
      tm("ng:mh-old-warm") { noop(mhOld()) }
      tm("ng:mh-old") { noop(mhOld()) }
      tm("ng:mh-new-warm") { noop(mhNew()) }
      tm("ng:mh-new") { noop(mhNew()) }
    }

    if (fams.contains("plans18c")) {
      // Continuation-session evidence: the bigram-chain cache-vs-barrier
      // rebalance. BEFORE = the r18-snapshot shape (corpus-sized
      // docBigrams persisted, tails re-aggregate the cached table);
      // AFTER = the shipped shape (pair-vocab c2 barrier, corpus
      // pipeline runs once per consumer).
      import org.apache.spark.sql.execution.FormattedMode
      import graft.operators.TextAnalysis
      def dump(name: String, df: DataFrame): Unit = {
        val p = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"plans/r18/$name.txt"),
          p.getBytes("UTF-8"))
        println(s"wrote plans/r18/$name.txt")
      }
      val fdocs = docs.where(col("doc_id").isNotNull)
      val dCached = TextAnalysis.docBigrams(fdocs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      dump("doc_pmi_topk_cache_before",
        TextAnalysis.pmiTail(TextAnalysis.pairCounts(dCached, "c_xy"), 20, 5L))
      dump("doc_bigram_lm_cache_before",
        TextAnalysis.bigramLmTail(fdocs, dCached,
          TextAnalysis.pairCounts(dCached, "c2")))
      dCached.unpersist(blocking = false)
      val dRaw2 = TextAnalysis.docBigrams(fdocs)
      val c2b = Barrier(TextAnalysis.pairCounts(dRaw2, "c_xy"))
      dump("doc_pmi_topk_c2barrier_after",
        TextAnalysis.pmiTail(c2b, 20, 5L))
      Barrier.release(c2b)
      val c2lm = Barrier(TextAnalysis.pairCounts(dRaw2, "c2"))
      dump("doc_bigram_lm_c2barrier_after",
        TextAnalysis.bigramLmTail(fdocs, dRaw2, c2lm))
      Barrier.release(c2lm)
    }

    if (fams.contains("jobs")) {
      // Per-job wall-time attribution for ONE invocation of each named
      // registered query (args after "jobs").
      for (nm <- args.drop(1).filterNot(_ == "jobs");
           fn <- SparkEntry.queries.get(nm)) {
        noop(fn(spark, sfDir)) // warm (and index build for serves)
        jobTimes(nm) { noop(fn(spark, sfDir)) }
      }
    }

    if (want("pqjobs")) {
      // Per-job wall times for one pqTopK invocation: attributes the
      // query's seconds to cache/head/collect/final jobs without touching
      // the operator.
      noop(Similarity.pqTopK(emb)) // warm
      jobTimes("pqTopK") { noop(Similarity.pqTopK(emb)) }
    }

    if (want("ivf2")) {
      // Does the PQ fused-stage pathology hit the kmeans serve too?
      val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("ev")).barrier()
      val book = Similarity.iterateBooks(v, 16, 2)
      tm("ivf2:fused-warm") {
        noop(Similarity.kmeansSearchPlan(v, book, 5, 10, 2))
      }
      tm("ivf2:fused") {
        noop(Similarity.kmeansSearchPlan(v, book, 5, 10, 2))
      }
      Barrier.release(v)
    }

    if (want("q21")) {
      val q = SparkEntry.queries("q21_last_shipper")
      tm("q21-warm") { noop(q(spark, sfDir)) }
      tm("q21") { noop(q(spark, sfDir)) }
    }

    if (want("agree")) {
      val q = SparkEntry.queries("doc_score_agreement")
      tm("agree-warm") { noop(q(spark, sfDir)) }
      tm("agree") { noop(q(spark, sfDir)) }
    }

    if (want("recall")) {
      val q = SparkEntry.queries("doc_minhash_recall")
      tm("mhrecall-warm") { noop(q(spark, sfDir)) }
      tm("mhrecall") { noop(q(spark, sfDir)) }
    }

    spark.stop()
  }
}
