package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "src0"),
    (1L, "the quick brown fox jumps over the lazy cat", "src0"), // near-dup of 0
    (2L, "completely different words here about spark engines", "src1"),
    (3L, "the quick brown fox jumps over the lazy dog", "src1"), // exact dup of 0
    (4L, "short doc", "src1"),
    (5L, "", "src2")
  ).toDF("doc_id", "text", "source")

  test("exactNgramPairs finds planted near-dups and nothing else") {
    val pairs = Corpus.exactNgramPairs(docs, "text", "doc_id", threshold = 0.5, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    // 0-1 share 6 of their 7+7 distinct trigrams; 0-3 and 1-3 exact/near
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L), (0L, 3L), (1L, 3L)))
    val exact = pairs.find(p => (p._1, p._2) == (0L, 3L)).get
    assert(exact._3 == 1.0) // identical text → Jaccard exactly 1
  }

  test("exactNgramPairs is lossless vs brute-force jaccard at threshold") {
    // brute-force oracle over all pairs
    val ng = docs.select(col("doc_id"),
      graft.functions.TextFunctions.wordNgrams(col("text"), 3).as("ng"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val expect = (for {
      a <- ng.keys; b <- ng.keys if a < b
      u = ng(a) union ng(b) if u.nonEmpty
      j = (ng(a) intersect ng(b)).size.toDouble / u.size if j >= 0.5
    } yield (a, b)).toSet
    val got = Corpus.exactNgramPairs(docs, "text", "doc_id", 0.5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("exactNgramPairs: hashed and string-gram blocking agree exactly") {
    val hashed = Corpus.exactNgramPairs(docs, "text", "doc_id", 0.5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val strings = Corpus.exactNgramPairs(docs, "text", "doc_id", 0.5, 3, hashGrams = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hashed == strings)
  }

  test("maxDf pruning drops pairs that only share ultra-common grams") {
    // every doc shares gram "x y z"; with maxDf below the doc count the
    // hot gram is pruned and the all-pairs blowup never materializes
    val hot = (0L to 9L).map(i => (i, s"x y z unique$i filler$i")).toDF("doc_id", "text")
    val unpruned = Corpus.exactNgramPairs(hot, "text", "doc_id", threshold = 0.1, n = 3)
    val pruned = Corpus.exactNgramPairs(hot, "text", "doc_id", threshold = 0.1, n = 3, maxDf = 5)
    assert(unpruned.count() == 45) // all pairs share "x y z"
    assert(pruned.count() == 0)
  }

  test("auto maxDf (default) equals the lossless join when near-dups share rare grams") {
    // 1200 docs all share a boilerplate trigram (df=1200 > auto cap
    // max(100, 0.1*1200)=120); the planted near-dup pair shares rare
    // grams too, so it must survive the cap with its exact score
    val base = (2L until 1200L).map(i =>
      (i, s"common boiler plate unique$i token$i extra$i"))
    val planted = Seq(
      (0L, "common boiler plate alpha beta gamma delta"),
      (1L, "common boiler plate alpha beta gamma epsilon"))
    val d = (planted ++ base).toDF("doc_id", "text")
    val capped = Corpus.exactNgramPairs(d, "text", "doc_id", 0.5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lossless = Corpus.exactNgramPairs(d, "text", "doc_id", 0.5, 3, maxDf = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == lossless)
    assert(capped.map(p => (p._1, p._2)) == Set((0L, 1L)))
    // score is the TRUE Jaccard over FULL sets: 4 shared of 6 distinct
    assert(math.abs(capped.head._3 - 4.0 / 6.0) < 1e-12)
  }

  test("auto maxDf guards the quadratic hot-gram blowup (documented one-sided miss)") {
    // 200 identical single-gram docs: the gram's df=200 exceeds the
    // auto cap (100), so the default path refuses to generate the
    // C(200,2) candidate pairs; the explicit lossless opt-in finds them
    val same = (0L until 200L).map(i => (i, "x y z")).toDF("doc_id", "text")
    assert(Corpus.exactNgramPairs(same, "text", "doc_id", 0.5, 3).count() == 0)
    assert(Corpus.exactNgramPairs(same, "text", "doc_id", 0.5, 3, maxDf = 0L)
      .count() == 199L * 200L / 2)
  }

  test("temperatureResample refuses caller columns colliding with internals") {
    val d = Seq((0L, "a", 1)).toDF("doc_id", "g", "_graft_tr_keep")
    val e = intercept[IllegalArgumentException] {
      Corpus.temperatureResample(d, "doc_id", "g", alpha = 0.5)
    }
    assert(e.getMessage.contains("_graft_tr_keep"))
  }

  test("stripBoilerplate removes frequent lines per group, preserves order and rows") {
    val d = Seq(
      (0L, "srcA", "HEADER\nbody zero\nFOOTER"),
      (1L, "srcA", "HEADER\nbody one\nFOOTER"),
      (2L, "srcA", "HEADER\nbody two\nmore two\nFOOTER"),
      (3L, "srcA", "HEADER\nFOOTER"),              // fully boilerplate
      (4L, "srcB", "HEADER\nbody b\nFOOTER"),       // group under minDocs
      (5L, "srcB", "HEADER\nother b\nFOOTER")
    ).toDF("doc_id", "source", "text")
    val out = Corpus.stripBoilerplate(d, "text", "doc_id", "source",
      minDocFrac = 0.5, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(0L) == "body zero")
    assert(out(2L) == "body two\nmore two") // order preserved
    assert(out(3L) == "")                   // row kept, text emptied
    // srcB has only 2 docs (< minDocs): untouched
    assert(out(4L) == "HEADER\nbody b\nFOOTER")
    assert(out.size == 6)
    // schema/columns unchanged
    assert(Corpus.stripBoilerplate(d, "text", "doc_id", "source")
      .columns.toSeq == d.columns.toSeq)
  }

  test("stripBoilerplate: null text stays null; null group passes through") {
    val d = Seq(
      (0L, Some("g"), Some("X\na")), (1L, Some("g"), Some("X\nb")),
      (2L, Some("g"), Some("X\nc")), (3L, Some("g"), None),
      (4L, None: Option[String], Some("X\nz"))
    ).toDF("doc_id", "source", "text")
    val out = Corpus.stripBoilerplate(d, "text", "doc_id", "source")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(0L).contains("a") && !out(0L).get.contains("X"))
    assert(out(3L).isEmpty)                    // null text preserved
    assert(out(4L).contains("X\nz"))           // null group unstripped
  }

  test("contaminationCounts reports every train doc exactly once, 0 when clean") {
    val bench = docs.filter(col("doc_id") === 0)
    val train = docs.filter(col("doc_id") > 0)
    val rows = Corpus.contaminationCounts(train, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(rows(3L) == 7)      // exact dup: all 7 trigrams shared
    assert(rows(1L) == 6)      // near-dup: all but the last trigram
    assert(rows(2L) == 0 && rows(4L) == 0 && rows(5L) == 0)
  }

  test("decontaminate removes exactly the docs sharing a gram with bench") {
    val bench = docs.filter(col("doc_id") === 0)
    val train = docs.filter(col("doc_id") > 0)
    val kept = Corpus.decontaminate(train, bench, "text", "doc_id", n = 3)
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 4L, 5L))
  }

  test("bloomDecontaminate returns exactly the exact decontaminate result") {
    // n=2 so the short docs participate too; any fpp must give the
    // exact result (false positives die in the verify join)
    for (fpp <- Seq(0.5, 0.01)) {
      val bench = docs.filter(col("doc_id") === 0L)
      val exact = Corpus.decontaminate(docs, bench, "text", "doc_id", n = 2)
        .collect().map(_.getLong(0)).sorted
      val bloom = Corpus.bloomDecontaminate(docs, bench, "text", "doc_id",
        n = 2, fpp = fpp).collect().map(_.getLong(0)).sorted
      assert(bloom.toSeq == exact.toSeq, s"fpp=$fpp")
    }
  }

  test("quotaPerGroup caps each group deterministically and growth-stably") {
    val df = spark.range(1000).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("string"))
    val capped = Corpus.quotaPerGroup(df, "grp", "id", cap = 10)
    val byGrp = capped.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.values.forall(_ == 10))
    // stability: the kept set for a group is unchanged when OTHER rows
    // grow the corpus — md5 rank only reorders within new candidates
    val grown = spark.range(2000).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("string"))
    val keptSmall = capped.filter(col("grp") === "0").collect().map(_.getLong(0)).toSet
    val keptGrown = Corpus.quotaPerGroup(grown, "grp", "id", 10)
      .filter(col("grp") === "0").collect().map(_.getLong(0)).toSet
    // grown corpus may displace some, but the selection is still by the
    // same global md5 order: recompute expected from first principles
    def expected(n: Long): Set[Long] = (0L until n).filter(_ % 4 == 0)
      .sortBy(i => (org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString), i))
      .take(10).toSet
    assert(keptSmall == expected(1000))
    assert(keptGrown == expected(2000))
  }

  test("quotaPerGroup guard: hot-group pre-thin and forced fallback match the unguarded cut") {
    import org.apache.commons.codec.digest.DigestUtils
    val df = spark.range(3000).toDF("id").withColumn("grp",
      when(col("id") % 7 === 0, lit(null).cast("string"))
        .otherwise((col("id") % 3).cast("string")))
    val expected: Map[String, Set[Long]] = (0L until 3000L)
      .map(i => (if (i % 7 == 0) null else (i % 3).toString, i))
      .groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(_._2)
          .sortBy(i => (DigestUtils.md5Hex(i.toString), i)).take(10).toSet
      }
    // factor 8 exercises the pre-thinned main path (every group is hot:
    // 80 < ~430); factor 0.1 thins to ~1 row so every group probes
    // short and the exact fallback (and, for some seeds, the
    // thinned-to-zero branch) must reproduce the unguarded result
    for (factor <- Seq(8.0, 0.1)) {
      val got = Corpus.quotaPerGroup(df, "grp", "id", cap = 10,
        preThinFactor = factor)
        .collect().map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet }
      assert(got == expected, s"factor=$factor")
    }
  }

  test("quota guards: null-id rows in a hot group survive the pre-thin") {
    import org.apache.commons.codec.digest.DigestUtils
    // md5(null) is null and the quota window orders by (md5(id), id)
    // asc nulls-first, so null-id rows rank FIRST and belong to every
    // downward-closed prefix — a null-blind thinKeep dropped them while
    // the row-count probe still read "safe" (the old thinned set held
    // >= cap rows), silently breaking the exact-ALWAYS guarantee
    val df = (0L until 1000L).map(i =>
      (if (i < 3) null else s"d$i", "hot")).toDF("id", "grp")
    val expectedNonNull = (3L until 1000L).map(i => s"d$i")
      .sortBy(id => (DigestUtils.md5Hex(id), id)).take(7).toSet
    val got = Corpus.quotaPerGroup(df, "grp", "id", cap = 10,
      preThinFactor = 8.0) // hot: 80 < 1000 → pre-thinned main path
      .collect().map(r => Option(r.getString(0)))
    assert(got.count(_.isEmpty) == 3, "all three null-id rows kept")
    assert(got.flatten.toSet == expectedNonNull)

    val toks = (0L until 1000L).map(i =>
      (if (i < 2) null else s"t$i", "hot", 10L)).toDF("id", "grp", "toks")
    val sortedIds = (2L until 1000L).map(i => s"t$i")
      .sortBy(id => (DigestUtils.md5Hex(id), id))
    // budget 100 at 10 tokens/row → 10 rows: the 2 nulls then 8 hashed
    val gotT = Corpus.tokenQuotaPerGroup(toks, "grp", "id", col("toks"),
      budget = 100L, preThinFactor = 8.0)
      .collect().map(r => Option(r.getString(0)))
    assert(gotT.count(_.isEmpty) == 2)
    assert(gotT.flatten.toSet == sortedIds.take(8).toSet)
  }

  test("tokenQuotaPerGroup guard: pre-thin and forced fallback match the unguarded cut") {
    import org.apache.commons.codec.digest.DigestUtils
    val d = (0L until 4000L).map(i =>
      (i, if (i % 11 == 0) null else (i % 2).toString, 5L + i % 9))
      .toDF("id", "grp", "toks")
    val expected: Map[String, Set[Long]] = (0L until 4000L)
      .map(i => (if (i % 11 == 0) null else (i % 2).toString, i, 5L + i % 9))
      .groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.sortBy(r => (DigestUtils.md5Hex(r._2.toString), r._2))
        val before = sorted.map(_._3).scanLeft(0L)(_ + _)
        g -> sorted.zip(before).filter(_._2 < 150L).map(_._1._2).toSet
      }
    for (factor <- Seq(8.0, 0.02)) {
      val got = Corpus.tokenQuotaPerGroup(d, "grp", "id", col("toks"),
        budget = 150L, preThinFactor = factor)
        .collect().map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet }
      assert(got == expected, s"factor=$factor")
    }
  }

  test("dedupParagraphs keeps first occurrence globally, exempts short paragraphs") {
    val d = Seq(
      (0L, "unique body zero\nthis paragraph repeats everywhere\n--"),
      (1L, "this paragraph repeats everywhere\nunique body one\n--"),
      (2L, "this paragraph repeats everywhere"),
      (3L, "unique body three")
    ).toDF("doc_id", "text")
    val out = Corpus.dedupParagraphs(d, "text", "doc_id", minChars = 20)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 0 owns the first occurrence; "--" is short → exempt everywhere
    assert(out(0L) == "unique body zero\nthis paragraph repeats everywhere\n--")
    assert(out(1L) == "unique body one\n--")
    assert(out(2L) == "") // fully deduped, row preserved
    assert(out(3L) == "unique body three")
  }

  test("dedupParagraphs and stripBoilerplate round-trip a null-id row's text") {
    val d = Seq(
      (Some(1L), "kept paragraph body one\nshared promo paragraph here"),
      (Some(2L), "shared promo paragraph here\nkept paragraph body two"),
      (None, "null id document body paragraph"))
      .toDF("doc_id", "text")
    val dp = Corpus.dedupParagraphs(d, "text", "doc_id", minChars = 20)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1)).toMap
    // before the null-safe join the null-id row's text was wiped to ""
    assert(dp(None) == "null id document body paragraph")
    val sb = Corpus.stripBoilerplate(
      d.withColumn("g", lit("s")), "text", "doc_id", "g",
      minDocs = 2, minDocFrac = 0.5)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1)).toMap
    assert(sb(None) == "null id document body paragraph")
    assert(sb(Some(1L)) == "kept paragraph body one")
  }

  test("tokenQuotaPerGroup admits docs until the budget, boundary doc straddles in") {
    val d = (0L until 100L).map(i => (i, "g", 10L + i % 5)).toDF("id", "grp", "toks")
    val kept = Corpus.tokenQuotaPerGroup(d, "grp", "id", col("toks"), budget = 120L)
    val rows = kept.collect().map(r => (r.getLong(0), r.getLong(2)))
    val total = rows.map(_._2).sum
    assert(total >= 120L)                       // budget reached
    assert(total - rows.map(_._2).max < 120L)   // overshoot ≤ one doc
    // deterministic under repartitioning
    val again = Corpus.tokenQuotaPerGroup(
      d.repartition(13), "grp", "id", col("toks"), 120L)
      .collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_._1).toSet)
    // a doc larger than the whole budget still admits when it is first
    val huge = Seq((1L, "g", 1000L)).toDF("id", "grp", "toks")
    assert(Corpus.tokenQuotaPerGroup(huge, "grp", "id", col("toks"), 10L)
      .count() == 1)
  }

  test("domainMixture matches the naive single-window semantics exactly") {
    import org.apache.spark.sql.expressions.Window
    // 3 domains with deliberately lumpy token counts; ids interleave
    // domains so md5 order differs from id order
    val d = (0L until 240L).map(i =>
      (i, Seq("web", "code", "wiki")(i.toInt % 3), 5L + i % 23))
      .toDF("id", "dom", "toks")
    val budgets = Map("web" -> 300L, "code" -> 2000L, "wiki" -> 10000L)
    val maxEpochs = 3
    val got = Corpus.domainMixture(d, "id", "dom", col("toks"), budgets, maxEpochs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // naive reference: replicate maxEpochs times, ONE window per domain
    val budgetOf = budgets.foldLeft(lit(null).cast("long")) {
      case (els, (k, v)) => when(col("dom") === k, lit(v)).otherwise(els)
    }
    val w = Window.partitionBy(col("dom"))
      .orderBy(col("epoch"), md5(col("id").cast("string")), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = d
      .select(col("id"), col("dom"), col("toks"),
        explode(sequence(lit(0L), lit(maxEpochs - 1L))).as("epoch"))
      .withColumn("start_off", coalesce(sum(col("toks")).over(w), lit(0L)))
      .filter(col("start_off") < budgetOf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getLong(2), r.getLong(4))).toSet
    assert(got == want)
    // wiki's budget exceeds maxEpochs full passes → every copy kept
    assert(got.count(_._2 == "wiki") == 80 * maxEpochs)
    // code needs its upsampled epoch 1 (total ≈ 1240 < 2000 budget)
    assert(got.exists(t => t._2 == "code" && t._3 == 1L))
    // web truncates inside epoch 0
    assert(got.filter(_._2 == "web").map(_._3).max == 0L)
    // stable under repartitioning (the distributed-prefix claim)
    val again = Corpus.domainMixture(
      d.repartition(17), "id", "dom", col("toks"), budgets, maxEpochs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(again == got)
  }

  test("domainMixture edges: null ids drop, zero-token domains, unknown domains") {
    val d = Seq(
      (Some(1L), "a", Some(10L)), (Some(2L), "a", None), // null toks → 0
      (None, "a", Some(99L)),                            // null id → dropped
      (Some(3L), "z", Some(50L)),                        // not in budgets
      (Some(4L), "b", Some(0L)), (Some(5L), "b", Some(0L))) // all-zero domain
      .toDF("id", "dom", "toks")
    val got = Corpus.domainMixture(
      d, "id", "dom", col("toks"), Map("a" -> 100L, "b" -> 7L), maxEpochs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(!got.exists(_._2 == "z"))
    assert(got.count(_._2 == "a") == 4) // ids 1,2 × both epochs (24 < 100)
    assert(got.filter(_._1 == 2L).forall(_._4 == 0L)) // null toks read 0
    // zero-token domain: every copy starts at 0 → all maxEpochs admitted
    assert(got.count(_._2 == "b") == 4)
    assert(got.filter(_._2 == "b").forall(_._5 == 0L))
    intercept[IllegalArgumentException] {
      Corpus.domainMixture(d, "id", "dom", col("toks"), Map("a" -> 0L))
    }
    intercept[IllegalArgumentException] {
      Corpus.domainMixture(d, "id", "dom", col("toks"), Map("a" -> 1L), 0)
    }
  }

  test("mixtureBudgets: exact largest-remainder allocation") {
    val b = Corpus.mixtureBudgets(
      Map("web" -> 0.5, "code" -> 0.3, "wiki" -> 0.2), 1000L)
    assert(b == Map("web" -> 500L, "code" -> 300L, "wiki" -> 200L))
    // 1/3 splits don't sum via floors alone — remainders hand out the rest
    val c = Corpus.mixtureBudgets(Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 100L)
    assert(c.values.sum == 100L)
    assert(c.values.forall(v => v == 33L || v == 34L))
    // deterministic tie-break: equal remainders resolve by name asc
    assert(c("a") == 34L)
    intercept[IllegalArgumentException] {
      Corpus.mixtureBudgets(Map("a" -> -1.0), 10L)
    }
  }

  test("hashSample matches fraction and is partition-independent") {
    val df = spark.range(20000).toDF("id")
    val a = Corpus.hashSample(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Corpus.hashSample(df.repartition(17), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size / 20000.0 - 0.3) < 0.02)
  }

  test("stratifiedHashSample keeps per-stratum fractions, drops unlisted strata") {
    val df = (0 until 9000).map(i => (i.toLong, Seq("a", "b", "c")(i % 3)))
      .toDF("id", "s")
    val out = Corpus.stratifiedHashSample(df, "s", "id", Map("a" -> 0.5, "b" -> 0.1))
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("c"))
    assert(math.abs(counts("a") / 3000.0 - 0.5) < 0.05)
    assert(math.abs(counts.getOrElse("b", 0L) / 3000.0 - 0.1) < 0.05)
    // consistent with the unstratified sampler on the same ids
    val aOnly = Corpus.hashSample(df.filter(col("s") === "a"), "id", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(out.filter(col("s") === "a").collect().map(_.getLong(0)).toSet == aOnly)
  }

  test("incrementalDedup drops batch rows whose content is already in the corpus") {
    val corpus = docs.filter(col("doc_id") < 2)
    val batch = docs
    val survivors = Corpus.incrementalDedup(batch, corpus, "text", "doc_id")
      .collect().map(_.getLong(0)).sorted
    // 0,1 are in the corpus; 3 duplicates 0's text; 2,4,5 are new
    assert(survivors.toSeq == Seq(2L, 4L, 5L))
    // schema untouched (helper column dropped)
    assert(Corpus.incrementalDedup(batch, corpus, "text", "doc_id").columns.toSeq
      == batch.columns.toSeq)
  }

  test("topTermsByRelevance ranks by tf/(df+1) with term tiebreak") {
    val d = Seq(
      (0L, "alpha alpha alpha beta", "g1"),
      (1L, "alpha beta gamma", "g1"),
      (2L, "beta delta", "g2")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.topTermsByRelevance(d, "text", "doc_id", "source", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val g1 = out.filter(_._1 == "g1").sortBy(_._2)
    // g1: alpha tf=4 df=2 → 4/3; beta tf=2 df=3 → 0.5; gamma 1/2
    assert(g1.map(t => (t._3, t._4, t._5)).toSeq == Seq(("alpha", 4L, 2L), ("beta", 2L, 3L)))
    val g2 = out.filter(_._1 == "g2").sortBy(_._2)
    // g2: delta tf=1 df=1 → 0.5 beats beta tf=1 df=3 → 0.25
    assert(g2.map(_._3).toSeq == Seq("delta", "beta"))
  }

  test("temperatureResample flattens a skewed mix toward uniform") {
    // 800 'a' vs 100 'b': alpha=0.5 keeps b fully, a at sqrt(1/8)≈0.354
    val d = ((0L until 800L).map((_, "a")) ++ (800L until 900L).map((_, "b")))
      .toDF("doc_id", "g")
    val out = Corpus.temperatureResample(d, "doc_id", "g", alpha = 0.5)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("b") > 95) // rarest group ~fully kept (weight-1 quantization)
    val kept = byG("a").toDouble / 800
    assert(kept > 0.25 && kept < 0.45) // ≈ sqrt(100/800) = 0.354
    // deterministic: repartitioning changes nothing
    val again = Corpus.temperatureResample(
      d.repartition(7), "doc_id", "g", alpha = 0.5)
      .agg(sum(col("doc_id"))).collect()(0).getLong(0)
    assert(again == out.agg(sum(col("doc_id"))).collect()(0).getLong(0))
    // alpha=1 is the exact natural mix
    assert(Corpus.temperatureResample(d, "doc_id", "g", 1.0).count() == 900)
  }

  test("temperatureResample keeps null-group rows (null-safe stats join)") {
    val d = ((0L until 100L).map(i => (i, Some("a"))) ++
      (100L until 150L).map(i => (i, None: Option[String])))
      .toDF("doc_id", "g")
    val out = Corpus.temperatureResample(d, "doc_id", "g", alpha = 0.5)
    val nullKept = out.filter(col("g").isNull).count()
    // null is the RAREST group (50 vs 100) → keep rate 1 (minus the
    // weight-1 ffffffff quantization edge) — a null-blind join would
    // return 0 here
    assert(nullKept >= 48)
  }

  test("packSequences assigns next-fit bins with straddling") {
    // one shard, budget 10, tokens 4,5,3,12,2 in id order:
    // prefix sums 0,4,9,12,24 → bins 0,0,1,2,2 (doc 3 straddles into 2)
    val d = Seq((0L, 4L), (1L, 5L), (2L, 3L), (3L, 12L), (4L, 2L))
      .toDF("doc_id", "n")
    val got = Corpus.packSequences(d, "doc_id",
      shard = lit(0), order = col("doc_id"), tokens = col("n"), budget = 10L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 0L, 0L), (1L, 0L, 4L), (2L, 0L, 9L),
      (3L, 1L, 2L), (4L, 2L, 4L)))
  }

  test("packMaterialize concatenates bins in pack order") {
    val d = Seq((0L, 4L, "aa"), (1L, 5L, "bb"), (2L, 3L, "cc"),
      (3L, 12L, "dd"), (4L, 2L, "ee"))
      .toDF("doc_id", "n", "text")
    val got = Corpus.packMaterialize(d, "doc_id", lit(0), col("doc_id"),
      col("n"), "text", budget = 10L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    // bins from the packSequences spec: 0:{0,1,2} 1:{3} 2:{4}
    assert(got.toSeq == Seq((0L, 3L, "aa bb cc"), (1L, 1L, "dd"),
      (2L, 1L, "ee")))
  }

  test("packSequences shards pack independently and deterministically") {
    val d = (0L until 1000L).map(i => (i, (i % 17) + 1)).toDF("doc_id", "n")
    val pack = Corpus.packSequences(d, "doc_id", shard = col("doc_id") % 4,
      order = col("doc_id"), tokens = col("n"), budget = 64L)
    val a = pack.collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val b = Corpus.packSequences(d.repartition(7), "doc_id",
      shard = col("doc_id") % 4, order = col("doc_id"),
      tokens = col("n"), budget = 64L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(a == b)
    // offsets stay inside the budget
    assert(a.values.forall(_._2 < 64L))
  }

  test("ngramLmScore matches the closed-form add-1 bigram model") {
    // reference: C(a,b)=2, C(b,a)=1, C(a,c)=1; ctx(a)=3, ctx(b)=1; V=3
    val ref = Seq((10L, "a b a b"), (11L, "a c")).toDF("doc_id", "text")
    val eval = Seq(
      (0L, "a b c"), // P(b|a)=(2+1)/(3+3)=1/2, P(c|b)=(0+1)/(1+3)=1/4
      (1L, "z z"),   // unseen context: P(z|z)=1/V=1/3
      (2L, "a")      // 1 token → no bigrams → no row
    ).toDF("doc_id", "text")
    val got = Corpus.ngramLmScore(ref, eval, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == Set(0L, 1L))
    val (n0, u0, r0, nll0, ppl0) = got(0L)
    assert((n0, u0, r0) == (2L, 1L, 0L))
    // ppl = geometric mean of 1/P = sqrt(2 * 4) = sqrt(8)
    assert(math.abs(nll0 - (-math.log(0.5) - math.log(0.25)) / 2) < 1e-12)
    assert(math.abs(ppl0 - math.sqrt(8.0)) < 1e-9)
    val (n1, u1, _, _, ppl1) = got(1L)
    assert((n1, u1) == (1L, 1L))
    assert(math.abs(ppl1 - 3.0) < 1e-9) // 1/P(z|z) = V = 3
  }

  test("ngramLmScore rareCutoff is a strict integer probability bound") {
    val ref = Seq((10L, "a b a b"), (11L, "a c")).toDF("doc_id", "text")
    val eval = Seq((0L, "a b c")).toDF("doc_id", "text")
    // cutoff 2: P(b|a)=1/2 is NOT < 1/2 (strict); P(c|b)=1/4 is → n_rare=1
    val r = Corpus.ngramLmScore(ref, eval, "text", "doc_id", rareCutoff = 2L)
      .select("n_rare").collect().head.getLong(0)
    assert(r == 1L)
  }

  test("ngramLmScore is input-partitioning invariant") {
    val ref = docs.filter(col("doc_id") =!= 5L)
    val a = Corpus.ngramLmScore(ref, docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val b = Corpus.ngramLmScore(ref.repartition(7), docs.repartition(5), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(a == b)
    assert(!a.contains(5L)) // empty text → no bigrams → no row
  }

  test("ngramBackoffScore(3) matches the closed-form stupid-backoff model") {
    // reference "a b a b a" + "b c":
    //   C3(a,b,a)=2, C3(b,a,b)=1; C2(a,b)=2, C2(b,a)=2, C2(b,c)=1;
    //   C1(a)=3, C1(b)=3, C1(c)=1; N=7
    val ref = Seq((10L, "a b a b a"), (11L, "b c")).toDF("doc_id", "text")
    val eval = Seq(
      (0L, "a b a c"), // (a,b,a): tri S=2/2=1; (b,a,c): uni S=.4^2*1/7
      (1L, "c b c"),   // (c,b,c): bi via (b,c) → S=.4*1/3
      (2L, "x y z"),   // fully OOV w3 → unseen, S=.4^2/7
      (3L, "a b")      // 2 tokens → no trigram → no row
    ).toDF("doc_id", "text")
    val got = Corpus.ngramBackoffScore(ref, eval, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7))).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    val (n0, t0, b0, u0, z0, nll0, _) = got(0L)
    assert((n0, t0, b0, u0, z0) == (2L, 1L, 0L, 1L, 0L))
    val exp0 = (-math.log(1.0) - math.log(0.16 * (1.0 / 7.0))) / 2
    assert(math.abs(nll0 - exp0) < 1e-12)
    val (n1, t1, b1, u1, z1, nll1, ppl1) = got(1L)
    assert((n1, t1, b1, u1, z1) == (1L, 0L, 1L, 0L, 0L))
    assert(math.abs(nll1 - -math.log(0.4 / 3.0)) < 1e-12)
    assert(math.abs(ppl1 - 3.0 / 0.4) < 1e-9) // exp(nll) = 1/S
    val (n2, t2, b2, u2, z2, nll2, _) = got(2L)
    assert((n2, t2, b2, u2, z2) == (1L, 0L, 0L, 0L, 1L))
    assert(math.abs(nll2 - -math.log(0.16 / 7.0)) < 1e-12)
  }

  test("ngramBackoffScore(5) resolves each tier of a hand-built suffix chain") {
    // one reference doc "a b c d e f": every k-gram count = 1, N = 6.
    val ref = Seq((10L, "a b c d e f")).toDF("doc_id", "text")
    val eval = Seq(
      (0L, "a b c d e"), // exact 5-gram hit: S = C5/C4(abcd) = 1/1
      (1L, "x b c d e"), // 5-miss, suffix (b,c,d,e) hits order 4: α·C4/C3(bcd)=0.4
      (2L, "x y c d e"), // order 3: α²·C3(cde)/C2(cd) = 0.16
      (3L, "x y z d e"), // order 2: α³·C2(de)/C1(d) = 0.064
      (4L, "x y z w e"), // order 1: α⁴·C1(e)/N = 0.0256/6
      (5L, "x y z w v")  // OOV final word: α⁴/N
    ).toDF("doc_id", "text")
    val got = Corpus.ngramBackoffScore(ref, eval, "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) ->
        (Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)), r.getDouble(8))).toMap
    assert(got(0L)._1 == Seq(1L, 1L, 0L, 0L, 0L, 0L, 0L))
    assert(math.abs(got(0L)._2 - -math.log(1.0)) < 1e-12)
    assert(got(1L)._1 == Seq(1L, 0L, 1L, 0L, 0L, 0L, 0L))
    assert(math.abs(got(1L)._2 - -math.log(0.4)) < 1e-12)
    assert(got(2L)._1 == Seq(1L, 0L, 0L, 1L, 0L, 0L, 0L))
    assert(math.abs(got(2L)._2 - -math.log(0.4 * 0.4)) < 1e-12)
    assert(got(3L)._1 == Seq(1L, 0L, 0L, 0L, 1L, 0L, 0L))
    assert(math.abs(got(3L)._2 - -math.log(0.4 * 0.4 * 0.4)) < 1e-12)
    assert(got(4L)._1 == Seq(1L, 0L, 0L, 0L, 0L, 1L, 0L))
    assert(math.abs(got(4L)._2 - -math.log(0.4 * 0.4 * 0.4 * 0.4 / 6.0)) < 1e-12)
    assert(got(5L)._1 == Seq(1L, 0L, 0L, 0L, 0L, 0L, 1L))
    assert(math.abs(got(5L)._2 - -math.log(0.4 * 0.4 * 0.4 * 0.4 / 6.0)) < 1e-12)
  }

  test("ngramBackoffScore is input-partitioning invariant and model-reusable") {
    val ref = docs.filter(col("doc_id") =!= 5L)
    val a = Corpus.ngramBackoffScore(ref, docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val model = Corpus.ngramBackoffModel(ref.repartition(7), "text", "doc_id", n = 3)
    val b = Corpus.scoreWithLmNModel(docs.repartition(5), model, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(a == b)
    // tier counts partition n_ngrams exactly
    a.values.foreach { case (n, t, bi, u, z) => assert(t + bi + u + z == n) }
  }

  // --------------------------------------------------------------- DSIR

  /** Code-independent replica of the DSIR feature/weight math: plain
    * Scala tokenize → unigram+bigram → md5-prefix bucket → smoothed
    * log ratio, no Spark anywhere. The operator must match it exactly.
    */
  private def dsirOracle(
      raw: Seq[(Long, String)], target: Seq[(Long, String)],
      hexChars: Int, k: Long): Map[Long, (Long, Long, Long, Long, Double)] = {
    def toksOf(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def feats(t: String): Seq[String] = {
      val w = toksOf(t)
      (w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
        .map(g => md5hex(g).take(hexChars))
    }
    def counts(c: Seq[(Long, String)]): Map[String, Long] =
      c.flatMap(d => feats(d._2)).groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val tc = counts(target)
    val rc = counts(raw)
    val (tTot, rTot) = (tc.values.sum, rc.values.sum)
    val b = math.pow(16.0, hexChars.toDouble).toLong
    raw.map { case (id, text) =>
      val f = feats(text).groupBy(identity).map { case (bk, v) => bk -> v.size.toLong }
      val nf = f.values.sum
      val tm = f.map { case (bk, m) => m * tc.getOrElse(bk, 0L) }.sum
      val rm = f.map { case (bk, m) => m * rc.getOrElse(bk, 0L) }.sum
      val oov = f.collect { case (bk, m) if !tc.contains(bk) => m }.sum
      val lw = f.map { case (bk, m) =>
        m * (math.log((tc.getOrElse(bk, 0L) + k).toDouble / (tTot + k * b)) -
          math.log((rc.getOrElse(bk, 0L) + k).toDouble / (rTot + k * b)))
      }.sum
      id -> (nf, tm, rm, oov, lw)
    }.toMap
  }

  test("dsirWeights matches the code-independent hand model exactly") {
    val raw = Seq(
      (0L, "spark streams shuffle data fast"),
      (1L, "medical notes about patient care"),
      (2L, "x"), // 1 token: unigram feature only, no bigram
      (3L, "")) // featureless → zeros, weight 0
    val target = Seq((100L, "medical notes on patient treatment and care"))
    val got = Corpus.dsirWeights(
      raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"),
      "text", "doc_id", hexChars = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val want = dsirOracle(raw, target, hexChars = 2, k = 1L) + (3L -> (0L, 0L, 0L, 0L, 0.0))
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (nf, tm, rm, oov, lw)) =>
      val (wnf, wtm, wrm, woov, wlw) = want(id)
      assert((nf, tm, rm, oov) == (wnf, wtm, wrm, woov), s"doc $id integer cols")
      assert(math.abs(lw - wlw) < 1e-12, s"doc $id log_weight $lw vs $wlw")
    }
    // the target-matching doc must outrank the off-domain one
    assert(got(1L)._5 > got(0L)._5)
  }

  test("dsirWeights degrades to the smoothing-only model on an empty target") {
    val raw = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val target = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = Corpus.dsirWeights(raw, target, "text", "doc_id", hexChars = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getDouble(5))).toMap
    // every feature is target-OOV; log p̂ = log(1/B) is finite, never null
    assert(got.values.forall { case (oov, lw) => oov == 3L && !lw.isNaN })
    val want = dsirOracle(Seq((0L, "a b"), (1L, "c d")), Seq.empty, 2, 1L)
    got.foreach { case (id, (_, lw)) =>
      assert(math.abs(lw - want(id)._5) < 1e-12)
    }
  }

  test("dsirWeights is input-partitioning invariant") {
    val raw = docs.filter(col("doc_id") % 2 === 0)
    val target = docs.filter(col("doc_id") % 2 =!= 0)
    val a = Corpus.dsirWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val b = Corpus.dsirWeights(raw.repartition(7), target.repartition(3), "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(a == b)
    assert(a.keySet == Set(0L, 2L, 4L)) // every raw doc emitted, incl. empty-text
  }

  test("dsirResample draws the deterministic Gumbel top-n") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val scored = Seq((1L, 0.0), (2L, 1.5), (3L, -0.5), (4L, 0.7), (5L, 0.2))
      .toDF("doc_id", "log_weight")
    def key(id: Long, salt: String): Double = {
      val u = (java.lang.Long.parseLong(md5hex(salt + id).take(8), 16) + 0.5) / 4294967296.0
      val w = Map(1L -> 0.0, 2L -> 1.5, 3L -> -0.5, 4L -> 0.7, 5L -> 0.2)(id)
      w - math.log(-math.log(u))
    }
    val want = (1L to 5L).sortBy(id => -key(id, "dsir")).take(2).toSet
    val got = Corpus.dsirResample(scored, "doc_id", n = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
    // re-running and re-partitioning reproduce the same draw; a new salt
    // is a fresh draw over the same weights
    val again = Corpus.dsirResample(scored.repartition(4), "doc_id", n = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)
    val salted = Corpus.dsirResample(scored, "doc_id", n = 2, salt = "seed2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(salted == (1L to 5L).sortBy(id => -key(id, "seed2")).take(2).toSet)
  }

  // ---------------------------------------------------- duplicate spans

  test("duplicateSpans counts exactly the cross-doc duplicated windows") {
    val d = Seq(
      // 0 and 1 share the 4-token span "one two three four" planted in
      // different surroundings
      (0L, "alpha one two three four beta"),
      (1L, "gamma delta one two three four"),
      // 2 repeats a span WITHIN itself only — must not count
      (2L, "p q r s p q r s"),
      (3L, "totally unrelated words entirely here"),
      (4L, "tiny")) // < n tokens → 0 spans
      .toDF("doc_id", "text")
    val got = Corpus.duplicateSpans(d, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // doc 0: 3 windows, 1 dup ("one two three four"); doc 1: same
    assert(got(0L) == (3L, 1L, true))
    assert(got(1L) == (3L, 1L, true))
    // doc 2: 5 windows of 4 over 8 tokens; "p q r s" occurs at offsets
    // 1 and 5 but only in THIS doc → not cross-doc, nothing flagged
    assert(got(2L) == (5L, 0L, false))
    assert(got(3L) == (2L, 0L, false))
    assert(got(4L) == (0L, 0L, false))
  }

  test("duplicateSpans counts multiplicity of a cross-doc span") {
    // doc 0 contains the shared span TWICE → both positions count
    val d = Seq(
      (0L, "a b c d x a b c d"),
      (1L, "z z a b c d")).toDF("doc_id", "text")
    val got = Corpus.duplicateSpans(d, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) == 2L)
    assert(got(1L) == 1L)
  }

  test("duplicateSpans is input-partitioning invariant") {
    val a = Corpus.duplicateSpans(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Corpus.duplicateSpans(docs.repartition(7), "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.size == docs.count()) // every doc emitted, incl. empty text
  }

  test("removeDuplicateSpans cuts exactly the covered cross-doc windows") {
    val docs = Seq(
      (1L, "alpha beta gamma delta unique1 tail1"),
      (2L, "start2  alpha beta gamma delta end2"), // double space normalizes
      (3L, "Totally different, words HERE indeed!"), // case/punct survive
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Corpus.removeDuplicateSpans(docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // shared run "alpha beta gamma delta": its two 3-windows appear in
    // both docs; coverage is the union of window spans
    assert(got(1L) == (("unique1 tail1", 6L, 4L)))
    assert(got(2L) == (("start2 end2", 6L, 4L)))
    assert(got(3L) == (("Totally different, words HERE indeed!", 5L, 0L)))
    assert(got(4L) == (("", 0L, 0L))) // null text -> "" with zero counts
  }

  test("removeDuplicateSpans: null-id rows pass through, uncounted and uncut") {
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "alpha beta gamma delta unique1 tail1"),
      (java.lang.Long.valueOf(2L), "start2 alpha beta gamma delta end2"),
      // null id: real text, but no identity to key the surgery on —
      // must pass through whitespace-normalized with ZERO removals,
      // even though it carries the duplicated run
      (null.asInstanceOf[java.lang.Long], "alpha  beta gamma delta floats here"))
      .toDF("doc_id", "text")
    val rows = Corpus.removeDuplicateSpans(docs, "text", "doc_id", n = 3)
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(None) == (("alpha beta gamma delta floats here", 6L, 0L)))
    // and its windows did NOT raise the doc-frequency of the shared run
    // past what docs 1+2 already establish (they still lose 4 tokens)
    assert(rows(Some(1L)) == (("unique1 tail1", 6L, 4L)))
    assert(rows(Some(2L)) == (("start2 end2", 6L, 4L)))
  }

  test("removeDuplicateSpans: fully-duplicated doc empties; invariant to partitioning") {
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "one two three four"), // exact twin: every window duplicated
      (3L, "solo words stand alone"))
      .toDF("doc_id", "text")
    val got = Corpus.removeDuplicateSpans(docs, "text", "doc_id", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (("", 4L, 4L)))
    assert(got(2L) == (("", 4L, 4L)))
    assert(got(3L)._3 == 0L)
    val a = Corpus.removeDuplicateSpans(docs, "text", "doc_id", n = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val b = Corpus.removeDuplicateSpans(docs.repartition(5), "text", "doc_id", n = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
  }

  test("removeDuplicateSpans: random corpora match an independent replica") {
    // tiny vocab ⇒ cross-doc duplicated windows abound naturally; the
    // replica recomputes the surgery with plain Scala collections
    // (string windows, set coverage) — nothing shared with the
    // operator's hash-keyed plan
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Seq("aa", "bb", "cc", "dd", "ee", "longword")
    val docGen = Gen.choose(0, 25).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.choose(4, 8).flatMap(d => Gen.listOfN(d, docGen))
    def replica(texts: Seq[String], n: Int): Map[Long, (String, Long, Long)] = {
      val words = texts.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
      val docsOf = scala.collection.mutable.Map.empty[String, Set[Int]]
      words.zipWithIndex.foreach { case (w, d) =>
        w.sliding(n).filter(_.size == n).foreach { g =>
          val k = g.mkString(" ")
          docsOf(k) = docsOf.getOrElse(k, Set.empty) + d
        }
      }
      val dup = docsOf.collect { case (g, ds) if ds.size >= 2 => g }.toSet
      words.zipWithIndex.map { case (w, d) =>
        val cov = (0 to w.size - n)
          .filter(i => w.size >= n && dup(w.slice(i, i + n).mkString(" ")))
          .flatMap(i => i until i + n).toSet
        val kept = w.indices.filterNot(cov).map(w)
        d.toLong -> (kept.mkString(" "), w.size.toLong, (w.size - kept.size).toLong)
      }.toMap
    }
    (0 until 25).foreach { seed =>
      val texts = corpusGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Corpus.removeDuplicateSpans(df, "text", "doc_id", n = 3)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == replica(texts, 3), s"seed $seed diverged")
    }
  }

  test("decontaminateSpans cuts bench windows, keeps sub-n fragments") {
    val bench = Seq((0L, "alpha beta gamma delta epsilon")).toDF("bid", "text")
    val hashes = Corpus.decontaminationSpanHashes(bench, "text", "bid", n = 3)
    val docs = Seq(
      // full bench run inside: windows 2..4 internal to the phrase hit;
      // words alpha..epsilon all covered, lead/tail survive
      (1L, "lead1 alpha beta gamma delta epsilon tail1"),
      // 2-word fragment: no 3-window of this doc exists in bench text
      (2L, "lead2 beta gamma tail2 closes here"),
      // 3-word INTERNAL window of the phrase hits on its own
      (3L, "beta gamma delta"),
      (4L, "Totally unrelated, words HERE!"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Corpus.decontaminateSpans(docs, hashes, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (("lead1 tail1", 7L, 5L)))
    assert(got(2L) == (("lead2 beta gamma tail2 closes here", 6L, 0L)))
    assert(got(3L) == (("", 3L, 3L)))
    assert(got(4L) == (("Totally unrelated, words HERE!", 4L, 0L)))
    assert(got(5L) == (("", 0L, 0L)))
  }

  test("decontaminateSpansBloom == decontaminateSpans for any fpp") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Seq("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.choose(0, 20).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))
    (0 until 10).foreach { seed =>
      val texts = Gen.listOfN(6, docGen)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val train = texts.take(4).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val bench = texts.drop(4).zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val exact = Corpus.decontaminateSpans(train,
        Corpus.decontaminationSpanHashes(bench, "text", "doc_id", n = 3),
        "text", "doc_id", n = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      // fpp = 0.5: aggressively false-positive-prone sketch — the exact
      // semi-join must still erase every difference
      val bloomed = Corpus.decontaminateSpansBloom(
        train, bench, "text", "doc_id", n = 3, fpp = 0.5)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      assert(bloomed == exact, s"seed $seed diverged")
    }
  }

  test("decontaminateSpans: no cross-doc effect, n-mismatch cuts nothing") {
    // two train docs SHARING a run that is absent from the bench: the
    // cross-doc duplicate machinery must NOT fire here — only bench
    // membership cuts
    val bench = Seq((0L, "completely separate benchmark phrase lives here"))
      .toDF("bid", "text")
    val hashes3 = Corpus.decontaminationSpanHashes(bench, "text", "bid", n = 3)
    val docs = Seq(
      (1L, "shared run one two three tail1"),
      (2L, "shared run one two three tail2"))
      .toDF("doc_id", "text")
    val got = Corpus.decontaminateSpans(docs, hashes3, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
    // bench hashed at n=4 probed at n=3: different-order windows never
    // collide — the scaladoc's silent-no-op contract
    val hashes4 = Corpus.decontaminationSpanHashes(
      Seq((0L, "alpha beta gamma delta epsilon")).toDF("bid", "text"),
      "text", "bid", n = 4)
    val planted = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val none = Corpus.decontaminateSpans(planted, hashes4, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(3)).sum
    assert(none == 0L)
  }

  test("temperatureWeights: alpha=1 natural, alpha->0 flattens, budgets sum exactly") {
    val totals = Map("en" -> 8000000L, "de" -> 1000000L, "sw" -> 10000L)
    // alpha = 1: proportions equal the natural shares
    val w1 = Corpus.temperatureWeights(totals, 1.0)
    val b1 = Corpus.mixtureBudgets(w1, 9010000L)
    assert(b1 == Map("en" -> 8000000L, "de" -> 1000000L, "sw" -> 10000L))
    // alpha = 0.3 (the mT5 point): low-resource share grows, order keeps
    val w3 = Corpus.mixtureBudgets(Corpus.temperatureWeights(totals, 0.3), 1000000L)
    assert(w3.values.sum == 1000000L)
    assert(w3("sw") > 10000L / 9L) // far above its natural ~0.11% share
    assert(w3("en") > w3("de") && w3("de") > w3("sw")) // order preserved
    // closed form: shares ∝ n^alpha — check one ratio to 1e-9
    val exp = math.pow(8000000.0, 0.3) / math.pow(1000000.0, 0.3)
    assert(math.abs(w3("en").toDouble / w3("de") - exp) < exp * 1e-3)
    // alpha near 0 approaches uniform
    val w0 = Corpus.mixtureBudgets(Corpus.temperatureWeights(totals, 0.01), 300L)
    assert(w0.values.forall(v => v >= 95 && v <= 105))
  }

  test("exactNtile == the window ntile on random data; null keys route out") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // group sizes straddling every remainder case (c mod n in 0..n-1),
    // plus a constant-value group (degenerate single range bucket) and
    // duplicate order values (ties broken by id)
    val rows = (0 until 7).flatMap { g =>
      val size = Seq(1, 2, 3, 4, 5, 17, 100)(g)
      (0 until size).map { i =>
        (g.toLong * 1000 + i, s"g$g",
          if (g == 3) 42L else rnd.nextInt(20).toLong)
      }
    }
    val df = rows.toDF("id", "grp", "v")
    for (n <- Seq(1, 2, 3, 4)) {
      val got = Corpus.exactNtile(df, "grp", col("v"), col("id"), n)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val want = df.withColumn("ntile",
          ntile(n).over(Window.partitionBy(col("grp"))
            .orderBy(col("v"), col("id"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == want, s"n=$n")
      // partitioning invariance
      val re = Corpus.exactNtile(df.repartition(13), "grp", col("v"), col("id"), n)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(re == want, s"n=$n repartitioned")
    }
    // null order keys: emitted with ntile null, others unaffected
    val withNull = Seq((1L, "a", java.lang.Long.valueOf(5L)),
      (2L, "a", null.asInstanceOf[java.lang.Long]),
      (3L, "a", java.lang.Long.valueOf(9L)))
      .toDF("id", "grp", "v")
    val nres = Corpus.exactNtile(withNull, "grp", col("v"), col("id"), 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(nres == Map(1L -> Some(1L), 2L -> None, 3L -> Some(2L)))
    // keys above 2^53: adjacent longs collapse to ONE double under the
    // bucket cast, but the within-bucket window orders by the RAW key —
    // id 3 (MaxValue-2) must out-rank id 2 (MaxValue-1) must out-rank
    // id 1 (MaxValue); a double-ordered rank would fall back to the id
    // tie-break and split the tiles wrong
    val big = Seq((1L, "g", Long.MaxValue), (2L, "g", Long.MaxValue - 1),
      (3L, "g", Long.MaxValue - 2), (4L, "g", 0L)).toDF("id", "grp", "v")
    val bres = Corpus.exactNtile(big, "grp", col("v"), col("id"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bres == Map(4L -> 1L, 3L -> 1L, 2L -> 2L, 1L -> 2L))
    // degenerate doubles: NaN ranks LAST (the window's NaN-is-greatest
    // slot), ±Inf clamp to the edge buckets — no ANSI cast crash
    val weird = Seq((1L, "w", 1.0), (2L, "w", Double.NaN),
      (3L, "w", Double.PositiveInfinity), (4L, "w", Double.NegativeInfinity))
      .toDF("id", "grp", "v")
    val wres = Corpus.exactNtile(weird, "grp", col("v"), col("id"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(wres == Map(4L -> 1L, 1L -> 2L, 3L -> 3L, 2L -> 4L))
  }

  test("exactNtile degenerate-value guard: 99% one order value stays exact") {
    import org.apache.spark.sql.expressions.Window
    // 500 rows in one group, 490 sharing ONE order value (the adversary
    // the round-13 verdict flagged): with hotBucket = 8 the guard
    // engages — hot-value sections + 256 tie sub-buckets — and the
    // result must STILL equal the window ntile exactly, ties included.
    // A second untouched group and a second hot value in the same
    // bucket ride along.
    val rows = (1L to 500L).map { i =>
      val v = if (i <= 350) 5.0 else if (i <= 490) 5.5 else i.toDouble / 50
      (i, "big", v)
    } ++ (1L to 30L).map(i => (1000L + i, "small", i.toDouble))
    val df = rows.toDF("id", "grp", "v")
    for (n <- Seq(1, 3, 4, 7)) {
      val got = Corpus.exactNtile(df, "grp", col("v"), col("id"), n,
          hotBucket = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val want = df.withColumn("ntile",
          ntile(n).over(Window.partitionBy(col("grp"))
            .orderBy(col("v"), col("id"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == want, s"n=$n")
      val re = Corpus.exactNtile(df.repartition(13), "grp", col("v"),
          col("id"), n, hotBucket = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(re == want, s"n=$n repartitioned")
    }
    // STRING tie keys through the hex-prefix monotone map: mixed
    // lengths and shared prefixes ("a" < "aa" < "b") must sub-bucket
    // consistently with Spark's string order
    val srows = (1L to 200L).map { i =>
      val tie = ("a" * (1 + (i % 4)).toInt) + ('a' + (i % 26)).toChar + i
      (i, tie, 7.0)
    }
    val sdf = srows.toDF("id", "tie", "v")
    val sgot = Corpus.exactNtile(sdf, "v", col("v"), col("tie"), 4,
        hotBucket = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val swant = sdf.withColumn("ntile",
        ntile(4).over(Window.partitionBy(col("v"))
          .orderBy(col("v"), col("tie"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(sgot == swant)
  }

  test("exactNtile fails fast on a non-numeric order column") {
    // a string score column's cast("double") nulls out non-numeric
    // VALUES, which would silently route real keys into the null-ntile
    // branch while a window ntile ranks them — so reject the type
    val df = Seq((1L, "g", "low"), (2L, "g", "high")).toDF("id", "grp", "s")
    val ex = intercept[IllegalArgumentException] {
      Corpus.exactNtile(df, "grp", col("s"), col("id"), 2)
    }
    assert(ex.getMessage.contains("numeric or timestamp"))
    // timestamps stay accepted (cast-to-double is total on them)
    val ts = Seq((1L, "g", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "g", java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("id", "grp", "t")
    val got = Corpus.exactNtile(ts, "grp", col("t"), col("id"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("perplexityBuckets: ascending terciles per lang, null score -> tail") {
    val scored = Seq(
      (1L, "en", java.lang.Double.valueOf(1.0)),
      (2L, "en", java.lang.Double.valueOf(2.0)),
      (3L, "en", java.lang.Double.valueOf(3.0)),
      (4L, "en", null.asInstanceOf[java.lang.Double]),
      (5L, "de", java.lang.Double.valueOf(9.0)))
      .toDF("id", "lang", "avg_neg_logscore")
    val got = Corpus.perplexityBuckets(
        scored, "lang", "avg_neg_logscore", col("id"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("bucket")).toMap
    // lower avg_neg_logscore = closer to the reference = head
    assert(got == Map(1L -> "head", 2L -> "middle", 3L -> "tail",
      4L -> "tail", 5L -> "head"))
  }

  test("trainingOrder: packSequences bin arithmetic + md5 order key, re-seedable") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val mix = Seq(
      (1L, "a", 0L, 5L, 0L), (2L, "a", 0L, 5L, 5L), (3L, "a", 0L, 5L, 10L),
      (4L, "b", 0L, 7L, 0L), (5L, "b", 1L, 7L, 7L))
      .toDF("doc_id", "domain", "epoch", "n_tokens", "start_off")
    val got = Corpus.trainingOrder(mix, "doc_id", budget = 8L, nShards = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7))).toMap
    // bin = start_off div 8, off = start_off mod 8 (doc 2 straddles INTO
    // bin 0 at off 5 — the packSequences convention)
    assert(got(1L)._1 == 0L && got(1L)._2 == 0L)
    assert(got(2L)._1 == 0L && got(2L)._2 == 5L)
    assert(got(3L)._1 == 1L && got(3L)._2 == 2L)
    assert(got(4L)._1 == 0L && got(4L)._2 == 0L)
    assert(got(5L)._1 == 0L && got(5L)._2 == 7L)
    // order key = md5("order:<domain>:<bin>") — independent Java replica;
    // same (domain, bin) shares a key (docs 1+2), epochs do not split it
    // (docs 4+5: same domain AND bin via offsets, same key)
    assert(got(1L)._3 == md5hex("order:a:0"))
    assert(got(1L)._3 == got(2L)._3)
    assert(got(3L)._3 == md5hex("order:a:1"))
    assert(got(4L)._3 == md5hex("order:b:0"))
    assert(got(4L)._3 == got(5L)._3)
    // shard = first nibble mod nShards, and within [0, nShards)
    got.values.foreach { case (_, _, k, sh) =>
      assert(sh == java.lang.Long.parseLong(k.substring(0, 1), 16) % 8)
      assert(sh >= 0 && sh < 8)
    }
    // re-seed changes the global order, not the bin placement
    val reseeded = Corpus.trainingOrder(mix, "doc_id", 8L, 8, salt = "s2")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(reseeded(1L) == md5hex("s2:a:0"))
    assert(reseeded(1L) != got(1L)._3)
  }

  test("qualitySignals equals the per-family operators field for field") {
    val docs = Seq(
      (1L, "the same line\nthe same line\n\nwait... so on...\n- item\nthe data" +
        " to be checked # with care and that will hold of course.\nlorem ipsum here"),
      (2L, "a plain page of steady prose that simply carries on. it ends here."),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val sig = Corpus.qualitySignals(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    // C4 half vs c4Clean
    val c4 = Corpus.c4Clean(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    // quality half vs gopherQuality, repetition half vs gopherRepetition
    val gq = Corpus.gopherQuality(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val gr = Corpus.gopherRepetition(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      val s = sig(id)
      assert(s.getAs[Long]("c4_n_lines") == c4(id).getAs[Long]("n_lines"))
      assert(s.getAs[Long]("c4_n_lines_kept") == c4(id).getAs[Long]("n_lines_kept"))
      assert(s.getAs[Long]("c4_n_sentences") == c4(id).getAs[Long]("n_sentences"))
      assert(s.getAs[Boolean]("c4_kept") == c4(id).getAs[Boolean]("kept"))
      Seq("n_words", "sum_word_len", "n_alpha_words", "n_hash", "n_ellipsis",
        "n_lines", "n_bullet_lines", "n_ellipsis_lines", "n_stop_hits")
        .foreach(f => assert(s.getAs[Long](f) == gq(id).getAs[Long](f), s"$f @$id"))
      assert(s.getAs[Boolean]("quality_kept") == gq(id).getAs[Boolean]("kept"))
      assert(s.getAs[Long]("rep_n_lines") == gr(id).getAs[Long]("n_lines"))
      Seq("dup_lines", "dup_line_chars", "n_paras", "dup_paras",
        "dup_para_chars", "text_chars", "top2_chars", "top3_chars",
        "top4_chars", "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars",
        "dup9_chars", "dup10_chars")
        .foreach(f => assert(s.getAs[Long](f) == gr(id).getAs[Long](f), s"$f @$id"))
      assert(s.getAs[Boolean]("repetition_kept") == gr(id).getAs[Boolean]("kept"))
    }
    // null text reads as empty everywhere: zero counts, false flags, und
    assert(sig(4L).getAs[Long]("n_tokens") == 0L)
    assert(sig(4L).getAs[String]("lang") == "und")
    assert(sig(1L).getAs[String]("lang") == "en")
    assert(sig(1L).getAs[Long]("n_tokens") > 0L)
  }

  // ------------------------------------------------------------ C4 clean

  test("c4Clean applies each line rule independently") {
    val page = Seq((0L, Seq(
      "this sentence properly ends with a period.", // kept
      "no terminal punctuation on this line", // dropped: punct
      "two words.", // dropped: < 3 words
      "she said \"stay right there.\"", // kept: ends in quote
      "Enable JavaScript to continue browsing now.", // dropped: javascript
      "is this a kept question?", // kept
      "short one." // dropped: 2 words
    ).mkString("\n"))).toDF("doc_id", "text")
    val r = Corpus.c4Clean(page, "text", "doc_id").collect().head
    assert(r.getString(1) == Seq(
      "this sentence properly ends with a period.",
      "she said \"stay right there.\"",
      "is this a kept question?").mkString("\n"))
    assert((r.getLong(2), r.getLong(3)) == (7L, 3L))
  }

  test("c4Clean page filters: sentence floor, bad phrase, curly bracket") {
    val pages = Seq(
      // 5 one-sentence keeper lines → exactly at the floor, kept
      (0L, (1 to 5).map(i => s"sentence number $i stands complete here.").mkString("\n")),
      // 4 sentences → below the floor
      (1L, (1 to 4).map(i => s"sentence number $i stands complete here.").mkString("\n")),
      // enough sentences but poisoned by placeholder text
      (2L, (1 to 5).map(i => s"sentence number $i stands complete here.").mkString("\n") +
        "\nthe lorem ipsum generator left this behind."),
      // enough sentences but a curly bracket anywhere on the page kills it
      (3L, (1 to 5).map(i => s"sentence number $i stands complete here.").mkString("\n") +
        "\nif (x) { return; }"),
      (4L, "")) // empty page: 0 sentences, dropped
      .toDF("doc_id", "text")
    val got = Corpus.c4Clean(pages, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    assert(got(0L) == (5L, true))
    assert(got(1L) == (4L, false))
    assert(got(2L)._2 == false)
    assert(got(3L)._2 == false)
    assert(got(4L) == (0L, false))
  }

  // --------------------------------------------------------- Gopher rules

  test("gopherQuality counts each metric exactly on a crafted page") {
    val page = Seq(
      "The quick brown fox has be to of and that with it", // 11 words, stops
      "  - bullet item", // bullet after trim
      "* second bullet",
      "count ## #", // 3 hashes
      "trailing thought...", // ... line-end + 1 ellipsis
      "mid... dots", // 1 ellipsis, not line-end
      "unicode one…", // … line-end + 1 ellipsis
      "....", // 4 dots = ONE non-overlapping '...' (+ line-end hit)
      "", // blank line: counts as a line, no bullet/ellipsis
      "42 7 x9" // numeric words: 2 non-alpha, 1 alpha
    ).mkString("\n")
    val r = Corpus.gopherQuality(Seq((0L, page)).toDF("doc_id", "text"),
      "text", "doc_id").collect().head
    val got = (1 to 9).map(r.getLong).toList
    val words = page.split("\\s+").filter(_.nonEmpty)
    assert(got(0) == words.length) // n_words
    assert(got(1) == words.map(_.length).sum) // sum_word_len
    assert(got(2) == words.count(_.exists(_.isLetter))) // n_alpha_words
    assert(got(3) == 3L) // n_hash
    assert(got(4) == 4L) // '...'x3 (one per dotted line, '....'=1) + '…'
    assert(got(5) == 10L) // n_lines
    assert(got(6) == 2L) // bullet lines
    assert(got(7) == 3L) // '...', '…', '....' line-ends
    assert(got(8) == 7L) // the be to of and that with (no 'have')
    assert(r.getBoolean(10) == false) // fails the 50-word floor
  }

  test("gopherQuality kept flag flips on each published threshold") {
    // base page: 60 clean 4-letter words + stop words → passes all rules
    val goodWords = (1 to 58).map(i => "word").mkString(" ")
    val base = s"the and $goodWords"
    def kept(text: String): Boolean =
      Corpus.gopherQuality(Seq((0L, text)).toDF("doc_id", "text"),
        "text", "doc_id").collect().head.getBoolean(10)
    assert(kept(base) == true)
    assert(kept("the and word") == false) // < 50 words
    // mean word length: sixty 1-char words → mean 1 < 3
    assert(kept("the and " + (1 to 58).map(_ => "a").mkString(" ")) == false)
    // symbol ratio counts '#' CHARS: 5 over 61 words passes (<= 6.1),
    // 7 over 67 words fails (> 6.7)
    assert(kept(base + " " + "#" * 5) == true)
    assert(kept(base + " # # # # # # #") == false)
    // alpha words: add 16 pure-number words → 60/76 < 80%
    assert(kept(base + " " + (1 to 16).map(_ => "1234").mkString(" ")) == false)
    // stop words: strip them → only generic words remain
    assert(kept(goodWords + " word word") == false)
    // bullets: every line bulleted → 100% > 90%
    assert(kept((1 to 10).map(_ => s"- the and $goodWords").mkString("\n")) == false)
    // ellipsis line-ends: 4 of 10 lines > 30%
    val ell = (1 to 4).map(_ => s"the and $goodWords...") ++
      (1 to 6).map(_ => s"the and $goodWords")
    assert(kept(ell.mkString("\n")) == false)
  }

  test("gopherRepetition counts each metric exactly on a crafted page") {
    // two identical paragraphs of two lines each, then a spaced single
    // word; every count below is hand-derived from the spec (lines
    // split on \n space-trimmed non-empty; paragraphs split on >=2 \n;
    // dup = occurrences beyond the first; word n-grams space-joined,
    // top = count*len of the most frequent repeating gram, dup = ALL
    // occurrences of grams appearing >= 2 times)
    val page = "aa bb aa bb\ncc dd\n\naa bb aa bb\ncc dd\n\n  ee  "
    val r = Corpus.gopherRepetition(
      Seq((0L, page)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head
    val got = (1 to 16).map(r.getLong).toList
    assert(got == List(
      5L, 2L, 16L, // lines: 5 non-empty; 2 beyond-first; 11+5 chars
      3L, 1L, 17L, // paras: 3; "aa bb aa bb\ncc dd" repeated; 17 chars
      44L, // text_chars
      20L, // top2: "aa bb" x4 * len 5
      16L, // top3: max count 2, longest argmax len 8
      22L, // top4: "aa bb aa bb" x2 * len 11
      56L, // dup5: two 5-grams x2 occurrences x len 14
      34L, // dup6: "aa bb aa bb cc dd" x2 x len 17
      0L, 0L, 0L, 0L)) // no 7..10-gram repeats
    assert(r.getBoolean(17) == false) // 5*56 > 3*44 → dup-5-gram trips
  }

  test("gopherRepetition kept flips on each published threshold") {
    val uw = (0 until 240).map(i => s"u${i}x")
    def rep(text: String) = Corpus.gopherRepetition(
      Seq((0L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head
    def kept(text: String): Boolean = rep(text).getBoolean(17)
    // interleave unique lines with copies of a one-word line so the
    // duplicate never becomes a repeated 2-gram
    def mkLines(nDup: Int, sep: String): String = {
      val uniq = (0 until 10 - (nDup + 1))
        .map(i => uw.slice(i * 4 + 20, i * 4 + 24).mkString(" "))
      val dups = Seq.fill(nDup + 1)("kq")
      (0 until math.max(uniq.size, dups.size)).flatMap(i =>
        uniq.lift(i).toSeq ++ dups.lift(i).toSeq).mkString(sep)
    }
    // dup-line fraction <= 0.30: EXACT boundary — 3 of 10 is 30 <= 30
    assert(kept(mkLines(3, "\n")) == true)
    val lf = rep(mkLines(4, "\n"))
    assert(10L * lf.getLong(2) > 3L * lf.getLong(1) && !lf.getBoolean(17))
    // dup-paragraph fraction <= 0.30, isolated from the line rule by
    // 5-line unique paragraphs (dup lines stay 4 of 35)
    def mkParas(nDup: Int): String = {
      val uniq = (0 until 6).map(i => (0 until 5)
        .map(j => uw.slice(i * 25 + j * 5 + 40, i * 25 + j * 5 + 45)
          .mkString(" ")).mkString("\n"))
      val dups = Seq.fill(nDup + 1)("pq")
      (0 until math.max(uniq.size, dups.size)).flatMap(i =>
        uniq.lift(i).toSeq ++ dups.lift(i).toSeq).mkString("\n\n")
    }
    assert(kept(mkParas(3)) == true)
    val pf = rep(mkParas(4))
    assert(10L * pf.getLong(5) > 3L * pf.getLong(4) && !pf.getBoolean(17))
    // dup-line CHAR fraction <= 0.20: four distinct duplicated 4-word
    // lines inside non-duplicated paragraphs; shrinking the filler
    // pushes 5*dup_line_chars past text_chars with no other rule near
    def mkLineChars(fillWords: Int): String = {
      val parts = (0 until 4).flatMap { i =>
        val dl = s"q${i}abc r${i}def s${i}ghi t${i}jkl"
        Seq(dl + "\n" + uw.slice(150 + i * 3, 153 + i * 3).mkString(" "),
          dl + "\n" + uw.slice(170 + i * 3, 173 + i * 3).mkString(" "))
      }
      (parts :+ uw.take(fillWords).mkString(" ")).mkString("\n\n")
    }
    assert(kept(mkLineChars(60)) == true)
    val lc = rep(mkLineChars(25))
    assert(5L * lc.getLong(3) > lc.getLong(7) && !lc.getBoolean(17))
    // dup-paragraph CHAR fraction <= 0.20: whole 4-word paragraphs
    // duplicated — necessarily also duplicate lines with the same char
    // mass, so the two char rules fail TOGETHER (inherent coupling:
    // identical paragraphs have identical lines) and nothing else does
    def mkParaChars(fillWords: Int): String = {
      val parts = (0 until 4).flatMap { i =>
        val p = s"q${i}abc r${i}def s${i}ghi t${i}jkl"
        Seq(p, p)
      } ++ (0 until 7).map(j => uw.slice(j * 4, j * 4 + 4).mkString(" "))
      (parts :+ uw.slice(100, 100 + fillWords).mkString(" ")).mkString("\n\n")
    }
    val pc = rep(mkParaChars(20))
    assert(5L * pc.getLong(6) > pc.getLong(7) && !pc.getBoolean(17))
    // top-2-gram char fraction <= 0.20: "xy zw" repeated with two
    // unique separator words per repeat (no longer gram ever repeats)
    def mkTop(phrase: Seq[String], seps: Int, k: Int, fillWords: Int): String =
      ((0 until k).flatMap(i =>
        phrase ++ (0 until seps).map(j => uw(i * seps + j))) ++
        uw.slice(120, 120 + fillWords)).mkString(" ")
    assert(kept(mkTop(Seq("xy", "zw"), 2, 12, 40)) == true)
    val t2 = rep(mkTop(Seq("xy", "zw"), 2, 20, 10))
    assert(5L * t2.getLong(8) > t2.getLong(7) && !t2.getBoolean(17))
    // top-3-gram <= 0.18 (trips before the looser top-2 rule can)
    assert(kept(mkTop(Seq("xy", "zw", "vk"), 2, 8, 40)) == true)
    val t3 = rep(mkTop(Seq("xy", "zw", "vk"), 2, 14, 20))
    assert(50L * t3.getLong(9) > 9L * t3.getLong(7) && !t3.getBoolean(17))
    // top-4-gram <= 0.16: single-char words keep the inner top-3 mass
    // below ITS threshold while the quad crosses
    assert(kept(mkTop(Seq("a", "b", "c", "d"), 3, 8, 40)) == true)
    val t4 = rep(mkTop(Seq("a", "b", "c", "d"), 3, 12, 20))
    assert(25L * t4.getLong(10) > 4L * t4.getLong(7) && !t4.getBoolean(17))
    // duplicate-5-gram chars <= 0.15 (tightest reachable tier: any
    // repeated phrase duplicates its sub-grams, so 5 trips first)
    assert(kept(mkTop(Seq("a", "b", "c", "d", "e"), 4, 6, 40)) == true)
    val d5 = rep(mkTop(Seq("a", "b", "c", "d", "e"), 4, 10, 25))
    assert(20L * d5.getLong(11) > 3L * d5.getLong(7) && !d5.getBoolean(17))
    // 6..10-gram tiers: a thrice-repeated 10-word phrase must cross
    // EVERY dup-n-gram inequality (the documented cascade — duplicated
    // long grams always duplicate their sub-grams)
    val casc = rep(mkTop((0 until 10).map(i => ('a' + i).toChar.toString),
      9, 3, 10))
    val tc = casc.getLong(7)
    assert(20L * casc.getLong(11) > 3L * tc)
    assert(50L * casc.getLong(12) > 7L * tc)
    assert(100L * casc.getLong(13) > 13L * tc)
    assert(25L * casc.getLong(14) > 3L * tc)
    assert(100L * casc.getLong(15) > 11L * tc)
    assert(10L * casc.getLong(16) > tc)
    assert(!casc.getBoolean(17))
  }

  test("gopherQualityFull combines both A1.1 halves") {
    val stops = "the be to of and that have with"
    val goodBody = (0 until 60).map(i => s"w${i}ord").mkString(" ")
    val flood = (0 until 30).map(_ => "again and").mkString(" ")
    val docs = Seq(
      (1L, s"$stops $goodBody"), // passes both halves
      (2L, s"$stops tiny"), // fails the 50-word floor only
      (3L, s"$stops $goodBody $flood"), // >= 50 words but repetition-floods
      (4L, s"spam $flood")) // fails both halves
      .toDF("doc_id", "text")
    val got = Corpus.gopherQualityFull(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got(1L) == ((true, true, true)))
    assert(got(2L) == ((false, true, false)))
    assert(got(3L) == ((true, false, false)))
    assert(got(4L)._3 == false)
    assert(got(4L)._1 == false && got(4L)._2 == false)
    // kept is ALWAYS the conjunction of the halves
    got.values.foreach { case (q, r, k) => assert(k == (q && r)) }
  }

  // ----------------------------------------------------------------- BPE

  /** Code-independent plain-Scala BPE (Sennrich et al.): word-freq dict
    * → iterative most-frequent-pair merges, ties by (count desc, left,
    * right). All integer — the engine must match EXACTLY.
    */
  private def bpeOracle(
      texts: Seq[String], numMerges: Int,
      minPairFreq: Long = 2L): Seq[(String, String)] = {
    val freq = texts
      .flatMap(_.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    var words: Map[Vector[String], Long] =
      freq.map { case (w, f) => (w.map(String.valueOf(_)).toVector :+ "</w>") -> f }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, c) = counts.toSeq
          .sortBy { case ((l, r), n) => (-n, l, r) }.head
        if (c < minPairFreq) done = true
        else {
          merges += pair
          // rebuild symbol sequences from the raw dict by replaying all
          // merges (freqs re-sum if two spellings ever collide)
          val rebuilt = scala.collection.mutable.Map.empty[Vector[String], Long]
          freq.foreach { case (w, f) =>
            var syms = w.map(String.valueOf(_)).toVector :+ "</w>"
            merges.foreach { case (l, r) =>
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                  out += (l + r); i += 2
                } else { out += syms(i); i += 1 }
              }
              syms = out.result()
            }
            rebuilt(syms) = rebuilt.getOrElse(syms, 0L) + f
          }
          words = rebuilt.toMap
        }
      }
    }
    merges.toSeq
  }

  test("bpeTrain matches the plain-Scala reference merge sequence exactly") {
    val texts = Seq(
      "low low low low low lower lower newest newest newest newest newest newest",
      "widest widest widest new new")
    val got = Corpus.bpeTrain(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", numMerges = 12)
    val want = bpeOracle(texts, numMerges = 12)
    assert(got == want, s"\n got: $got\nwant: $want")
    assert(got.nonEmpty && got.size <= 12)
  }

  test("q168 fixture: the forced word multiset pins the exact merge sequence") {
    // the qC34BpePlanted construction in miniature: {aaaa×16, bbbb×8,
    // abab×4, cc×2} forces, via hand-checked integer pair counts and
    // the (count desc, l, r) unsigned-UTF-8 argmax, exactly this
    // 6-merge sequence — including both tie-break arms ("</w>" sorts
    // before letters at merges 3/6; "a" < "bb" at the count-8 tie of
    // merge 5). If this ever fails, q168's oracle literals are stale.
    val words = Seq.fill(16)("aaaa") ++ Seq.fill(8)("bbbb") ++
      Seq.fill(4)("abab") ++ Seq.fill(2)("cc")
    val merges = Corpus.bpeTrain(
      words.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "text", numMerges = 6, minFreq = 2L)
    assert(merges == Seq(("a", "a"), ("b", "b"), ("aa", "</w>"),
      ("aa", "aa</w>"), ("a", "b"), ("bb", "</w>")), merges)
    val enc = Corpus.bpeEncode(
      Seq((0L, "aaaa"), (1L, "bbbb"), (2L, "abab"), (3L, "cc"))
        .toDF("doc_id", "text"), "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    assert(enc(0L) == Seq("aaaa</w>"))
    assert(enc(1L) == Seq("bb", "bb</w>"))
    assert(enc(2L) == Seq("ab", "ab", "</w>"))
    assert(enc(3L) == Seq("c", "c", "</w>"))
  }

  test("bpeEncode applies merges greedily by rank and counts real tokens") {
    val texts = Seq("low low low lower lowest", "low low lower")
    val merges = Corpus.bpeTrain(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", numMerges = 6)
    // "low" must have fused into a single token after 6 merges on this
    // corpus ("l o w </w>" appears 5 times — the top pairs)
    val enc = Corpus.bpeEncode(
      Seq((0L, "low lowering unseen"), (1L, "")).toDF("doc_id", "text"),
      "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](2), r.getLong(3))).toMap
    val (toks0, n0) = enc(0L)
    assert(n0 == toks0.size)
    assert(toks0.head == "low</w>") // fully merged known word
    // unseen word still segments (into smaller units), never drops
    assert(toks0.count(_.endsWith("</w>")) == 3) // one word boundary each
    assert(enc(1L)._1.isEmpty && enc(1L)._2 == 0L)
  }

  test("DSIR model persists as a snapshot: save -> load -> score ≡ in-session") {
    val raw = (0 until 30).map(i =>
      (i.toLong, s"common words everywhere plus filler $i")).toDF("doc_id", "text")
    val target = (0 until 10).map(i =>
      (100L + i, s"rare quality prose with care $i")).toDF("doc_id", "text")
    val model = Corpus.dsirModel(raw, target, "text", "doc_id", hexChars = 1)
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_dsir_snap").toString
    assert(Corpus.saveDsirModel(spark, warehouse, "dsir", model) == 1)
    val loaded = Corpus.loadDsirModel(spark, warehouse, "dsir")
    assert(loaded.hexChars == model.hexChars)
    val probe = Seq((200L, "rare quality prose"), (201L, "common filler"),
      (202L, "")).toDF("doc_id", "text")
    def scores(m: Corpus.DsirModel) =
      Corpus.scoreWithDsirModel(probe, m, "text", "doc_id")
        .orderBy(col("id")).select("id", "log_weight").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(scores(loaded) == scores(model))
    // refit on a different target publishes v2; v1 stays pinned
    val model2 = Corpus.dsirModel(raw, raw.limit(5), "text", "doc_id", hexChars = 1)
    assert(Corpus.saveDsirModel(spark, warehouse, "dsir", model2) == 2)
    assert(scores(Corpus.loadDsirModel(spark, warehouse, "dsir", version = 1))
      == scores(model))
  }

  test("n-gram LM persists as a snapshot: save -> load -> score ≡ in-session") {
    val ref = (0 until 20).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again " + (i % 3)))
      .toDF("doc_id", "text")
    val model = Corpus.ngramBackoffModel(ref, "text", "doc_id", n = 3)
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_lmn_snap").toString
    assert(Corpus.saveLmNModel(spark, warehouse, "lm3", model) == 1)
    val loaded = Corpus.loadLmNModel(spark, warehouse, "lm3")
    assert(loaded.n == 3)
    val probe = Seq((100L, "the quick brown fox"), (101L, "unseen gibberish zz"),
      (102L, "")).toDF("doc_id", "text")
    def scores(m: Corpus.LmNModel) =
      Corpus.scoreWithLmNModel(probe, m, "text", "doc_id")
        .orderBy(col("id")).select("id", "avg_neg_logscore").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(scores(loaded) == scores(model))
    // the totals row round-trips (k = 0 carries token count, not grams)
    val t0 = model.totals.head().getLong(0)
    assert(loaded.totals.head().getLong(0) == t0)
  }

  test("classifier persists as a snapshot: save -> load -> score ≡ in-session") {
    val pos = (0 until 20).map(i =>
      (i.toLong, "the fine report holds steady value and reads with care " + i))
      .toDF("doc_id", "text")
    val neg = (20 until 40).map(i =>
      (i.toLong, "zzz spam spam buy now xx " + i)).toDF("doc_id", "text")
    val model = Corpus.trainQualityClassifier(
      pos, neg, "text", "doc_id", hexChars = 1, iters = 5)
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_clf_snap").toString
    val v1 = Corpus.saveClassifier(spark, warehouse, "quality_clf", model)
    assert(v1 == 1)
    val loaded = Corpus.loadClassifier(spark, warehouse, "quality_clf")
    assert(loaded.bias == model.bias)
    assert(loaded.hexChars == model.hexChars)
    val probe = Seq((100L, "the fine report holds steady value"),
      (101L, "zzz spam buy now"), (102L, "")).toDF("doc_id", "text")
    def scores(m: Corpus.LinearModel) =
      Corpus.scoreWithClassifier(probe, m, "text", "doc_id")
        .select("id", "quality", "keep").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(scores(loaded) == scores(model))
    // retrain publishes v2; v1 stays pinned-loadable and still scores
    // identically (the reproducible keep/drop posture)
    val model2 = Corpus.trainQualityClassifier(
      pos, neg, "text", "doc_id", hexChars = 1, iters = 9)
    assert(Corpus.saveClassifier(spark, warehouse, "quality_clf", model2) == 2)
    assert(Corpus.loadClassifier(spark, warehouse, "quality_clf").bias
      == model2.bias)
    assert(scores(Corpus.loadClassifier(
      spark, warehouse, "quality_clf", version = 1)) == scores(model))
  }

  test("BPE merge table persists as a snapshot: save -> load -> encode ≡ in-session") {
    val texts = Seq(
      "low low low low low lower lower newest newest newest newest newest newest",
      "widest widest widest new new")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Corpus.bpeTrain(docs, "text", numMerges = 10)
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_bpe_snap").toString
    val v1 = Corpus.saveBpeMerges(spark, warehouse, "bpe_merges", merges)
    assert(v1 == 1)
    val loaded = Corpus.loadBpeMerges(spark, warehouse, "bpe_merges")
    assert(loaded == merges, "rank order must survive the round-trip")
    // encode with the LOADED table ≡ encode with the in-session one
    val probe = Seq((0L, "low lowering newest unseen"), (1L, ""))
      .toDF("doc_id", "text")
    val a = Corpus.bpeEncode(probe, "text", merges)
      .select("doc_id", "bpe_tokens", "n_bpe_tokens").collect().toSeq
    val b = Corpus.bpeEncode(probe, "text", loaded)
      .select("doc_id", "bpe_tokens", "n_bpe_tokens").collect().toSeq
    assert(a == b)
    // retrain on a GROWN corpus publishes v2; v1 stays pinned-loadable
    // (the reproducible-re-tokenization posture)
    val grown = docs.unionByName(
      Seq((9L, "brand new words widest widest lower")).toDF("doc_id", "text"))
    val merges2 = Corpus.bpeTrain(grown, "text", numMerges = 10)
    val v2 = Corpus.saveBpeMerges(spark, warehouse, "bpe_merges", merges2)
    assert(v2 == 2)
    assert(Corpus.loadBpeMerges(spark, warehouse, "bpe_merges") == merges2)
    assert(Corpus.loadBpeMerges(spark, warehouse, "bpe_merges", version = 1)
      == merges)
    intercept[IllegalArgumentException] {
      Corpus.saveBpeMerges(spark, warehouse, "bpe_merges", Seq.empty)
    }
  }

  test("bpeEncode -> packSequences: bins cut at exact BPE-token boundaries") {
    // PLANTED merge table — token counts are hand-computable, so the
    // whole tokenizer-exact packing composition (the q151 shape) pins
    // against closed-form bins. With merges (a,b),(ab,c),(abc,</w>):
    //   "abc"  -> [abc</w>]                      = 1 token
    //   "abcd" -> [abc, d, </w>]                 = 3 tokens
    //   "ab"   -> [ab, </w>]                     = 2 tokens
    val merges = Seq(("a", "b"), ("ab", "c"), ("abc", "</w>"))
    val docs = Seq(
      (1L, "s", "abc abc abc"), // 3 tokens
      (2L, "s", "abcd ab"), // 5 tokens
      (3L, "s", "abc"), // 1 token
      (4L, "t", "ab ab ab")) // 6 tokens
      .toDF("doc_id", "shard", "text")
    val enc = Corpus.bpeEncode(docs, "text", merges)
    val counts = enc.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    assert(counts == Map(1L -> 3L, 2L -> 5L, 3L -> 1L, 4L -> 6L))
    // budget 4 BPE tokens: shard s prefix sums 0,3,8 -> bins 0,0,2 with
    // offsets 0,3,0; shard t starts its own bin space
    val packed = Corpus.packSequences(
        enc, "doc_id", col("shard"), col("doc_id"), col("n_bpe_tokens"),
        budget = 4L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("shard"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("bin"), r.getAs[Long]("off"))).toMap
    assert(packed == Map(
      1L -> (("s", 3L, 0L, 0L)),
      2L -> (("s", 5L, 0L, 3L)),
      3L -> (("s", 1L, 2L, 0L)),
      4L -> (("t", 6L, 0L, 0L))))
  }

  test("blockedWordsFilter: word boundaries, multi-word runs, case, nulls") {
    val docs = Seq(
      (1L, "this part has a class discussion"), // 'art'/'ass' must NOT hit
      (2L, "modern Art reshaped the museum"), // word 'art' hits (cased)
      (3L, "the merge batch runs nightly"), // multi-word run hits
      (4L, "merge the batch separately"), // words present, run broken
      (5L, "it's an art-house film"), // tokenizer splits art-house -> art hits
      (6L, null.asInstanceOf[String]), // null text -> kept
      (7L, "ART ART art")) // three hits counted
      .toDF("doc_id", "text")
    val got = graft.operators.Corpus
      .blockedWordsFilter(docs, "text", "doc_id",
        terms = Seq("Art", "merge batch"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((0L, false, true)))
    assert(got(2L) == ((1L, false, false)))
    assert(got(3L) == ((0L, true, false)))
    assert(got(4L) == ((0L, false, true)))
    assert(got(5L) == ((1L, false, false)))
    assert(got(6L) == ((0L, false, true)))
    assert(got(7L) == ((3L, false, false)))
  }

  test("blockedUrlFilter: parent-domain matching, ports, non-URLs, case") {
    val rows = Seq(
      (1L, "https://bad.example/x"), // exact entry
      (2L, "https://ads.tracker.bad.example/y"), // matches parent 2 up
      (3L, "https://BAD.EXAMPLE:8443/z"), // case + port stripped
      (4L, "https://notbad.example/a"), // 'bad.example' is NOT a suffix
      (5L, "https://good.example/b"),
      (6L, null.asInstanceOf[String]), // null -> empty host, kept
      (7L, "no url here")) // non-URL -> empty host, kept
      .toDF("doc_id", "url")
    val dom = Seq("bad.example").toDF("domain")
    val got = graft.operators.Corpus
      .blockedUrlFilter(rows, "url", "doc_id", dom)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got(1L) == (("bad.example", true)))
    assert(got(2L) == (("ads.tracker.bad.example", true)))
    assert(got(3L) == (("bad.example", true)))
    assert(got(4L) == (("notbad.example", false))) // label-boundary, not substring
    assert(got(5L)._2 == false)
    assert(got(6L) == (("", false)))
    assert(got(7L) == (("", false)))
    // maxLevels bounds how deep a parent can reach: with 1 level only
    // the TLD-ish last label is probed and nothing matches
    val shallow = graft.operators.Corpus
      .blockedUrlFilter(rows, "url", "doc_id", dom, maxLevels = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(shallow.values.forall(_ == false))
  }

  test("packSequencesNoSplit: closed-form bins, oversize, exact-fit, invariance") {
    // budget 10; shard s: docs 4,4,4 -> third doc can't straddle: bins
    // 0,0,1; then 10 (exact fit of bin 1? no: used=4 -> 4+10>10 closes
    // -> bin 2 alone, exactly full), then 3 -> bin 3; shard t: 12
    // (oversized: own bin 0, off 0), then 5 -> bin 1
    val docs = Seq(
      (1L, "s", 1L, 4L), (2L, "s", 2L, 4L), (3L, "s", 3L, 4L),
      (4L, "s", 4L, 10L), (5L, "s", 5L, 3L),
      (10L, "t", 1L, 12L), (11L, "t", 2L, 5L))
      .toDF("doc_id", "shard", "ord", "n")
    val got = graft.operators.Corpus.packSequencesNoSplit(
        docs, "doc_id", col("shard"), col("ord"), col("n"), budget = 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      1L -> ((0L, 0L)), 2L -> ((0L, 4L)), 3L -> ((1L, 0L)),
      4L -> ((2L, 0L)), 5L -> ((3L, 0L)),
      10L -> ((0L, 0L)), 11L -> ((1L, 0L))))
    // a doc NEVER straddles: off + n <= budget unless it sits alone
    val all = graft.operators.Corpus.packSequencesNoSplit(
        spark.read.parquet(sf() + "/documents.parquet"),
        "doc_id", col("doc_id") % 4, col("doc_id"),
        col("n_chars") % 50, budget = 64L)
      .collect()
    all.foreach { r =>
      val (n, off) = (r.getLong(2), r.getLong(4))
      assert(off + n <= 64L || off == 0L, s"straddle at ${r.getLong(0)}")
    }
    // partitioning invariance (the walk is per-shard; input partitioning
    // must not matter)
    val a = graft.operators.Corpus.packSequencesNoSplit(
        docs, "doc_id", col("shard"), col("ord"), col("n"), 10L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    val b = graft.operators.Corpus.packSequencesNoSplit(
        docs.repartition(7), "doc_id", col("shard"), col("ord"), col("n"), 10L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(a == b)
  }

  test("bpeTrain is partitioning-invariant (integer argmax, no ties to luck)") {
    val d = docs.filter(col("doc_id") =!= 5L)
    val a = Corpus.bpeTrain(d, "text", numMerges = 8)
    val b = Corpus.bpeTrain(d.repartition(7), "text", numMerges = 8)
    assert(a == b)
  }

  test("bpeTrain driver-local and distributed merge loops agree exactly") {
    // ties abound in a small corpus — the local loop must replicate the
    // distributed argmax order (count desc, then UTF-8-byte-lex l, r)
    // merge for merge, including the minPairFreq stop
    val d = docs
    val local = Corpus.bpeTrain(d, "text", numMerges = 40)
    val dist = Corpus.bpeTrain(d, "text", numMerges = 40,
      localMergeMaxWords = 0)
    assert(local == dist)
    // and both stop identically when the pair supply dries up
    val tiny = Seq((0L, "ab ab cd")).toDF("doc_id", "text")
    assert(Corpus.bpeTrain(tiny, "text", numMerges = 50) ==
      Corpus.bpeTrain(tiny, "text", numMerges = 50, localMergeMaxWords = 0))
  }

  test("bpeTrain local path reaches vocabulary-scale merge counts fast") {
    // 1,000 merges over a few-hundred-word dict: the per-merge cost is
    // incremental pair maintenance + one argmax scan — this must run in
    // seconds, not the distributed path's one-Spark-job-per-merge
    val texts = (0 until 1200).map { i =>
      (i.toLong, s"alpha${i}xq beta${i}zr gamma${i % 11} " * 3)
    }
    val df = texts.toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val merges = Corpus.bpeTrain(df, "text", numMerges = 1000,
      minPairFreq = 1L)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 1000, s"got ${merges.size} merges")
    assert(secs < 30.0, s"local merge loop took $secs s")
  }

  // ------------------------------------------------- quality classifier

  /** Code-independent plain-Scala replica of the classifier training:
    * same features (md5-prefix buckets, L1-normalized), same batch GD.
    */
  private def lrOracle(
      pos: Seq[(Long, String)], neg: Seq[(Long, String)],
      hexChars: Int, iters: Int, lr: Double): (Map[String, Double], Double) = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def feats(t: String): Map[String, Double] = {
      val w = t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq
      val grams = w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val m = grams.map(g => md5hex(g).take(hexChars))
        .groupBy(identity).map { case (b, v) => b -> v.size.toDouble }
      val tot = m.values.sum
      m.map { case (b, v) => b -> v / tot }
    }
    val ex = pos.map(d => (feats(d._2), 1.0)) ++ neg.map(d => (feats(d._2), 0.0))
    val n = ex.size.toDouble
    var w = Map.empty[String, Double]
    var b = 0.0
    for (_ <- 1 to iters) {
      val errs = ex.map { case (x, y) =>
        val dot = x.map { case (bk, v) => v * w.getOrElse(bk, 0.0) }.sum
        (x, 1.0 / (1.0 + math.exp(-(dot + b))) - y)
      }
      val g = errs.flatMap { case (x, e) => x.map { case (bk, v) => bk -> v * e } }
        .groupBy(_._1).map { case (bk, vs) => bk -> vs.map(_._2).sum / n }
      w = (w.keySet ++ g.keySet).map(bk =>
        bk -> (w.getOrElse(bk, 0.0) - lr * g.getOrElse(bk, 0.0))).toMap
      b -= lr * errs.map(_._2).sum / n
    }
    (w, b)
  }

  test("trainQualityClassifier matches the plain-Scala gradient descent") {
    val pos = Seq((0L, "excellent informative well researched article"),
      (1L, "thorough careful writing informative and clear"))
    val neg = Seq((10L, "click here casino winner spam offer"),
      (11L, "spam click casino free winner now"))
    val model = Corpus.trainQualityClassifier(
      pos.toDF("doc_id", "text"), neg.toDF("doc_id", "text"),
      "text", "doc_id", hexChars = 2, iters = 10, lr = 2.0)
    val (ww, wb) = lrOracle(pos, neg, hexChars = 2, iters = 10, lr = 2.0)
    val got = model.weights.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == ww.keySet)
    got.foreach { case (bk, v) => assert(math.abs(v - ww(bk)) < 1e-9, s"w($bk)") }
    assert(math.abs(model.bias - wb) < 1e-9)
  }

  test("quality classifier separates planted classes and generalizes") {
    val pos = (0L to 19L).map(i =>
      (i, s"informative well researched careful article number $i with clear structure"))
    val neg = (100L to 119L).map(i =>
      (i, s"click casino spam winner free offer number $i act now"))
    val model = Corpus.trainQualityClassifier(
      pos.toDF("doc_id", "text"), neg.toDF("doc_id", "text"), "text", "doc_id")
    val held = Seq(
      (1000L, "a careful informative article with clear research"),
      (1001L, "casino spam click free winner offer"),
      (1002L, "")) // featureless → sigmoid(bias)
    val got = Corpus.scoreWithClassifier(
      held.toDF("doc_id", "text"), model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got(1000L)._2 == true, s"held-out positive scored ${got(1000L)._1}")
    assert(got(1001L)._2 == false, s"held-out negative scored ${got(1001L)._1}")
    assert(got(1000L)._1 > got(1001L)._1)
    assert(got.contains(1002L)) // every doc emitted
  }

  /** Code-independent plain-Scala replica of the multinomial langid
    * training: same md5-prefix features, same L1 normalization, same
    * max-subtracted softmax, same batch GD.
    */
  private def langIdOracle(
      docs: Seq[(Long, String, String)], // (id, text, lang)
      hexChars: Int, iters: Int, lr: Double)
      : (Map[(String, String), Double], Map[String, Double]) = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def feats(t: String): Map[String, Double] = {
      val w = t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq
      val grams = w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val m = grams.map(g => md5hex(g).take(hexChars))
        .groupBy(identity).map { case (b, v) => b -> v.size.toDouble }
      val tot = m.values.sum
      m.map { case (b, v) => b -> v / tot }
    }
    val langs = docs.map(_._3).distinct.sorted
    val ex = docs.map(d => (feats(d._2), d._3)).filter(_._1.nonEmpty)
    val n = ex.size.toDouble
    var w = Map.empty[(String, String), Double]
    var b = langs.map(_ -> 0.0).toMap
    for (_ <- 1 to iters) {
      val errs = ex.map { case (x, y) =>
        val z = langs.map(l => l ->
          (x.map { case (bk, v) => v * w.getOrElse((l, bk), 0.0) }.sum + b(l)))
        val m = z.map(_._2).max
        val e = z.map { case (l, zl) => l -> math.exp(zl - m) }
        val s = e.map(_._2).sum
        (x, e.map { case (l, el) =>
          l -> (el / s - (if (y == l) 1.0 else 0.0)) }.toMap)
      }
      val g = errs.flatMap { case (x, e) =>
        for ((bk, v) <- x.toSeq; l <- langs) yield (l, bk) -> v * e(l)
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum / n }
      w = (w.keySet ++ g.keySet).map(k =>
        k -> (w.getOrElse(k, 0.0) - lr * g.getOrElse(k, 0.0))).toMap
      b = b.map { case (l, bl) =>
        l -> (bl - lr * errs.map(_._2(l)).sum / n) }
    }
    (w, b)
  }

  test("q169 fixture: disjoint buckets + symmetric classes force the decision") {
    // the qC35ClassifierPlanted preconditions, pinned: (1) the two
    // marker phrases hash to DISJOINT md5 feature-bucket sets at
    // hexChars 3 (unigrams + bigrams — if a phrase edit ever collides
    // them, the symmetry argument and q169's oracle are both stale);
    // (2) training on balanced pure-phrase classes separates every
    // pure-phrase eval doc with a margin far above float-reduction
    // noise, so keep == class is forced, not empirical.
    val qual = "crystal mountain river sunrise"
    val spam = "thunder velvet canyon whisper"
    def bucketsOf(phrase: String): Set[String] = {
      val ws = phrase.split(" ").toSeq
      val grams = ws ++ ws.zip(ws.tail).map { case (a, b) => s"$a $b" }
      grams.map { g =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 3)
      }.toSet
    }
    val (qb, sb) = (bucketsOf(qual), bucketsOf(spam))
    assert(qb.size == 7 && sb.size == 7 && (qb & sb).isEmpty,
      s"bucket sets must be disjoint: $qb vs $sb")
    val pos = (0L until 16L).map(i => (i * 2, qual)).toDF("doc_id", "text")
    val neg = (0L until 16L).map(i => (i * 2 + 1, spam)).toDF("doc_id", "text")
    val model = Corpus.trainQualityClassifier(
      pos, neg, "text", "doc_id", hexChars = 3, iters = 4, lr = 8.0)
    val scored = Corpus.scoreWithClassifier(
      (0L until 40L).map(i => (i, if (i % 2 == 0) qual else spam))
        .toDF("doc_id", "text"),
      model, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    scored.foreach { case (id, q, keep) =>
      assert(keep == (id % 2 == 0), s"doc $id keep=$keep quality=$q")
      assert(math.abs(q - 0.5) > 0.01,
        s"doc $id margin too thin for a forced decision: $q")
    }
  }

  test("trainLangId matches the plain-Scala multinomial gradient descent") {
    val docs = Seq(
      (0L, "alpha arbor anchor amber", "aa"),
      (1L, "amber apex alpha arbor anchor", "aa"),
      (2L, "birch basalt beacon bramble", "bb"),
      (3L, "bramble birch beacon basalt bisque", "bb"),
      (4L, "cedar cobalt cairn crimson", "cc"),
      (5L, "crimson cumin cedar cobalt cairn", "cc"))
    val model = Corpus.trainLangId(
      docs.toDF("doc_id", "text", "lang"), "text", "lang", "doc_id",
      hexChars = 2, iters = 8, lr = 2.0)
    val (ww, wb) = langIdOracle(docs, hexChars = 2, iters = 8, lr = 2.0)
    val got = model.weights.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == ww.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - ww(k)) < 1e-7, s"w($k): $v vs ${ww(k)}") }
    model.biases.foreach { case (l, v) =>
      assert(math.abs(v - wb(l)) < 1e-7, s"bias($l)") }
    assert(model.langs == Seq("aa", "bb", "cc"))
  }

  test("trained langid classifies held-out disjoint-vocabulary docs; featureless gets the prior") {
    val train = (0L to 29L).map { i =>
      val l = (i % 3).toInt
      val t = l match {
        case 0 => s"alpha arbor anchor amber apex argon alpha arbor"
        case 1 => s"birch basalt beacon bramble bisque borax birch basalt"
        case _ => s"cedar cobalt cairn crimson cumin cypress cedar cobalt"
      }
      (i, t, Seq("aa", "bb", "cc")(l))
    }
    val model = Corpus.trainLangId(
      train.toDF("doc_id", "text", "lang"), "text", "lang", "doc_id")
    val held = Seq(
      (100L, "anchor apex alpha argon amber"),
      (101L, "borax bisque bramble beacon"),
      (102L, "cypress cumin crimson cairn cedar"),
      (103L, "")) // token-less: bias-only argmax, still emitted
    val got = Corpus.langIdWith(
      held.toDF("doc_id", "text"), model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(100L)._1 == "aa", s"got ${got(100L)}")
    assert(got(101L)._1 == "bb", s"got ${got(101L)}")
    assert(got(102L)._1 == "cc", s"got ${got(102L)}")
    assert(got.contains(103L))
    // confidence clearly above the 3-class uniform prior (softmax over
    // a 30-iteration batch-GD fit is separating, not saturated)
    assert(got(100L)._2 > 0.37 && got(101L)._2 > 0.37 && got(102L)._2 > 0.37,
      s"confidences ${got(100L)._2}, ${got(101L)._2}, ${got(102L)._2}")
  }

  test("ccnetBucketsWith: loaded langid + loaded LM drive the CCNet buckets") {
    // the q163 seam: language from the TRAINED model (at the gate's
    // 4-iteration diet — disjoint vocabularies must classify 100%),
    // perplexity from a LOADED reference LM, terciles per model lang.
    // The composition must equal its oracle-pinned pieces keyed by the
    // TRUE labels (possible exactly because classification is perfect).
    val wh = java.nio.file.Files.createTempDirectory("graft_ccnetw_wh").toString
    val langs = Seq("aa", "bb", "cc")
    val vocab = Map(
      "aa" -> Seq("alpha", "arbor", "anchor", "amber", "apex", "argon"),
      "bb" -> Seq("birch", "basalt", "beacon", "bramble", "bisque", "borax"),
      "cc" -> Seq("cedar", "cobalt", "cairn", "crimson", "cumin", "cypress"))
    def textOf(i: Long): String = {
      val ws = vocab(langs((i % 3).toInt))
      (0 until 8).map(j => ws(((i * 7 + j * 3) % ws.size).toInt)).mkString(" ")
    }
    val corpus = (0L until 90L).map(i => (i, textOf(i), langs((i % 3).toInt)))
      .toDF("doc_id", "text", "lang")
    val train = corpus.filter(col("doc_id") % 10 === 0)
    Corpus.saveLangIdModel(spark, wh, "lid",
      Corpus.trainLangId(train, "text", "lang", "doc_id", iters = 4))
    Corpus.saveLmNModel(spark, wh, "reflm",
      Corpus.ngramBackoffModel(train, "text", "doc_id", n = 3))
    val held = corpus.filter(col("doc_id") % 10 =!= 0)
    val got = Corpus.ccnetBucketsWith(
        held, Corpus.loadLmNModel(spark, wh, "reflm"),
        Corpus.loadLangIdModel(spark, wh, "lid"), "text", "doc_id")
      .select(col("id"), col("lang"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    graft.ops.Caches.release()
    assert(got.length == 81)
    // 4 GD iterations separate disjoint vocabularies perfectly — the
    // claim the q161/q163 gate diet rests on
    got.foreach { case (id, lang, _) =>
      assert(lang == langs((id % 3).toInt), s"doc $id misclassified as $lang")
    }
    // composition == pieces keyed by TRUE labels
    val want = Corpus.perplexityBuckets(
        Corpus.scoreWithLmNModel(
          held, Corpus.loadLmNModel(spark, wh, "reflm"), "text", "doc_id")
          .join(held.select(col("doc_id").as("id"), col("lang")), Seq("id")),
        "lang", "avg_neg_logscore", col("id"))
      .select(col("id"), col("lang"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    graft.ops.Caches.release()
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1).toSeq)
    // every language contributes all three buckets (terciles engaged)
    val byLang = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    langs.foreach(l =>
      assert(byLang(l) == Set("head", "middle", "tail"), s"$l: ${byLang.get(l)}"))
  }

  test("langid model save -> load -> identify equals in-session; pinned version survives refit") {
    val wh = java.nio.file.Files.createTempDirectory("graft_langid_wh").toString
    val train = Seq(
      (0L, "alpha arbor anchor amber apex", "aa"),
      (1L, "apex alpha amber arbor anchor", "aa"),
      (2L, "birch basalt beacon bramble bisque", "bb"),
      (3L, "bisque birch bramble basalt beacon", "bb"))
    val model = Corpus.trainLangId(
      train.toDF("doc_id", "text", "lang"), "text", "lang", "doc_id", iters = 6)
    val v1 = Corpus.saveLangIdModel(spark, wh, "lid", model)
    val held = Seq((10L, "anchor alpha apex"), (11L, "beacon birch bisque"))
      .toDF("doc_id", "text")
    def ident(m: Corpus.LangIdModel) =
      Corpus.langIdWith(held, m, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val inSession = ident(model)
    val loaded = ident(Corpus.loadLangIdModel(spark, wh, "lid"))
    assert(loaded == inSession)
    // refit on swapped labels; the PINNED v1 still reproduces the old run
    val refit = Corpus.trainLangId(
      train.map(t => (t._1, t._2, if (t._3 == "aa") "bb" else "aa"))
        .toDF("doc_id", "text", "lang"), "text", "lang", "doc_id", iters = 6)
    Corpus.saveLangIdModel(spark, wh, "lid", refit)
    assert(ident(Corpus.loadLangIdModel(spark, wh, "lid", version = v1)) == inSession)
    assert(ident(Corpus.loadLangIdModel(spark, wh, "lid")) != inSession)
  }

  test("quality classifier is partitioning-invariant within float tolerance") {
    val pos = docs.filter(col("doc_id") < 3).toDF()
    val neg = docs.filter(col("doc_id") >= 3).toDF()
    val a = Corpus.trainQualityClassifier(pos, neg, "text", "doc_id", iters = 3)
    val b = Corpus.trainQualityClassifier(
      pos.repartition(7), neg.repartition(5), "text", "doc_id", iters = 3)
    val wa = a.weights.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wb = b.weights.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(wa.keySet == wb.keySet)
    wa.foreach { case (bk, v) => assert(math.abs(v - wb(bk)) < 1e-9) }
    assert(math.abs(a.bias - b.bias) < 1e-9)
  }

  // ----------------------------------------------------------- URL dedup

  test("canonicalizeUrl applies each RFC 3986 / tracker rule independently") {
    val cases = Seq(
      // scheme+host lowercase, path case preserved
      ("HTTPS://Example.ORG/Path/To", "https://example.org/Path/To"),
      // default ports dropped, scheme-specific
      ("http://a.com:80/x", "http://a.com/x"),
      ("https://a.com:443/x", "https://a.com/x"),
      ("https://a.com:8443/x", "https://a.com:8443/x"),
      ("http://a.com:443/x", "http://a.com:443/x"), // :443 is NOT http's default
      // fragment dropped, trailing slashes stripped
      ("https://a.com/x/#frag", "https://a.com/x"),
      ("https://a.com///", "https://a.com"),
      // tracker params stripped, real params kept in order, ?" dropped
      // when nothing survives; empty && segments dropped
      ("https://a.com/p?utm_source=x&id=7&utm_campaign=y", "https://a.com/p?id=7"),
      ("https://a.com/p?utm_source=x&gclid=1", "https://a.com/p"),
      ("https://a.com/p?a=1&&b=2", "https://a.com/p?a=1&b=2"),
      ("https://a.com/p?ref=tw&refid=9", "https://a.com/p?refid=9"), // ref dies, refid lives
      // non-URL values pass through untouched
      ("not a url at all", "not a url at all"),
      ("", ""))
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), graft.functions.TextFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) == want, s"canonicalize($in)")
    }
  }

  test("canonicalizeUrl is idempotent over generated URL-ish inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      scheme <- Gen.oneOf("http://", "HTTPS://", "ftp://", "HtTp://", "")
      host <- Gen.oneOf("Example.org", "a.b.co", "X9.net:8080",
        "site.com:80", "site.com:443", "")
      path <- Gen.oneOf("", "/", "/A/b", "/x/", "//", "/p.q/r")
      query <- Gen.oneOf("", "?a=1", "?utm_source=x", "?utm_a=1&b=2&gclid=3",
        "?&&", "?ref=t&REF=u", "?x=%20y")
      frag <- Gen.oneOf("", "#f", "#a?b=1")
    } yield scheme + host + path + query + frag
    val samples = {
      var seed = Seed(7L)
      (1 to 300).flatMap { _ =>
        val v = gen.apply(Gen.Parameters.default, seed)
        seed = seed.next
        v
      } ++ Seq("", "no scheme here", "weird:///x")
    }
    val c = graft.functions.TextFunctions.canonicalizeUrl _
    val rows = samples.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), col("url"), c(col("url")).as("c1"))
      .select(col("id"), col("url"), col("c1"), c(col("c1")).as("c2"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) == r.getString(3),
        s"not idempotent for '${r.getString(1)}': '${r.getString(2)}' -> '${r.getString(3)}'")
    }
  }

  test("dedupByUrl keeps exactly the min-id row per canonical key") {
    val rows = Seq(
      (5L, "https://a.com/p?utm_source=x"),
      (2L, "HTTPS://A.com/p"), // same canonical key as 5 → keeper (min id)
      (9L, "https://a.com/p/"), // trailing slash → same key again
      (3L, "https://b.com/q"),
      (4L, "not a url"),
      (6L, "not a url")) // passthrough collides with 4 → 4 keeps
      .toDF("doc_id", "url")
    val got = Corpus.dedupByUrl(rows, "url", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(2L, 3L, 4L, 5L, 6L, 9L)) // every row emitted
    assert(got(2L) == ("https://a.com/p", true))
    assert(got(5L) == ("https://a.com/p", false))
    assert(got(9L) == ("https://a.com/p", false))
    assert(got(3L)._2 == true)
    assert(got(4L) == ("not a url", true))
    assert(got(6L) == ("not a url", false))
  }

  test("dedupByUrl: the null-URL branch never enters the join (no hot key)") {
    // at crawl scale a meaningful missing-URL fraction must not funnel
    // through one planted join key — null rows get their constant flag
    // in a joinless Union branch
    val rows = Seq((1L, "https://a.com/p"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "url")
    val plan = Corpus.dedupByUrl(rows, "url", "doc_id")
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Union}
    val unions = plan.collect { case u: Union => u }
    assert(unions.nonEmpty, "expected a Union of join/null branches")
    val branches = unions.head.children
    val joinless = branches.filter(b => b.collect { case j: Join => j }.isEmpty)
    assert(joinless.nonEmpty,
      s"expected a joinless null branch in:\n$plan")
  }

  test("null inputs degrade to definite answers, never null flags or lost rows") {
    // dedupByUrl: a NULL url row is emitted (null-safe join) and keeps
    val rows = Seq((1L, "https://a.com/p"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "url")
    val got = Corpus.dedupByUrl(rows, "url", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true))
    // c4Clean / gopherQuality: null text reads as empty — kept is
    // FALSE, never NULL (a null flag drops the row from both
    // filter(kept) and filter(!kept))
    val nullPage = Seq((0L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val c4 = Corpus.c4Clean(nullPage, "text", "doc_id").collect().head
    assert(!c4.isNullAt(5) && c4.getBoolean(5) == false)
    assert(c4.getString(1) == "")
    val go = Corpus.gopherQuality(nullPage, "text", "doc_id").collect().head
    assert(!go.isNullAt(10) && go.getBoolean(10) == false)
    assert(go.getLong(1) == 0L)
    // classifier: featureless training inputs fail LOUDLY, not with an
    // NPE from a null gradient sum
    val empty = Seq((0L, "")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.trainQualityClassifier(empty, empty, "text", "doc_id", iters = 1)
    }
    assert(e.getMessage.contains("no featured training documents"))
  }

  test("c4Clean custom bad-phrase list and in-line sentence marks") {
    val pages = Seq(
      (0L, "one full sentence sits here! two more sentences follow now. three lands here? four arrives now. five closes it out."),
      (1L, "one full sentence sits here! two more sentences follow now. three lands here? four arrives now. five closes THE CASINO out."))
      .toDF("doc_id", "text")
    val got = Corpus.c4Clean(pages, "text", "doc_id", badPhrases = Seq("casino"))
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    // a single LINE carrying 5 sentences passes the floor (marks are
    // counted in retained text, not per line)
    assert(got(0L) == (5L, true))
    assert(got(1L)._2 == false) // case-insensitive phrase hit
  }
}
