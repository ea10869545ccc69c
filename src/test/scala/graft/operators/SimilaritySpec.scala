package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private lazy val corpus = Seq(
    (1L, vec(1, 0, 0, 0)),
    (2L, vec(0.9, 0.1, 0, 0)), // close to 1
    (3L, vec(0, 1, 0, 0)), // orthogonal
    (4L, vec(-1, 0, 0, 0)), // opposite
    (5L, vec(1, 0.01, 0, 0))) // closest
    .toDF("vec_id", "embedding")

  test("cosine: exact values for hand-computable vectors") {
    val sims = corpus
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), array(lit(1f), lit(0f), lit(0f), lit(0f))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(sims(1L) - 1.0) < 1e-12)
    assert(math.abs(sims(3L)) < 1e-12)
    assert(math.abs(sims(4L) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine with id tie-break") {
    val top = Similarity.bruteForceTopK(
      corpus.filter(col("vec_id") =!= 1), "embedding", "vec_id",
      vec(1, 0, 0, 0), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(5L, 2L))
  }

  test("crossTopK: each query gets its own ranked neighbors") {
    val out = Similarity.crossTopK(
      corpus, corpus.filter(col("vec_id").isin(1, 3)), "embedding", "vec_id", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val q1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(q1 == Seq(5L, 2L))
    assert(out.count(_._1 == 3L) == 2)
  }

  test("LSH: identical vector is always recalled (same bucket)") {
    val out = Similarity.lshTopK(
      corpus, "embedding", "vec_id", vec(1, 0, 0, 0), k = 3, dim = 4, bits = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(out.contains(1L)) // the identical vector shares the signature
  }

  test("LSH multiprobe still probes at bits >= 31 (Int-shift wrap guard)") {
    // `(1 << bits) - 1` wraps for bits >= 31 (bits=32 → 0), which
    // silently dropped every perturbation sig — multiprobe degraded to
    // the exact bucket only. Near-identical vectors flip exactly the
    // low-margin bits, which is what query-directed probing targets, so
    // with 32-bit buckets the probed run must recall strictly more.
    val dim = 16
    val q = (0 until dim).map(j => math.sin(j * 1.7 + 0.3)).toArray
    val noisy = (1 to 120).map { i =>
      (i.toLong, (0 until dim)
        .map(j => (q(j) + 0.12 * math.sin(i * 7.31 + j * 2.13)).toFloat))
    }
    val c = ((0L, q.map(_.toFloat).toSeq) +: noisy.map { case (i, v) => (i, v.toSeq) })
      .toDF("vec_id", "embedding")
    val qf = q.map(_.toFloat).toSeq
    def ids(probes: Int) = Similarity.lshTopK(
      c, "embedding", "vec_id", qf, k = 121, dim = dim,
      bits = 32, probes = probes).collect().map(_.getLong(0)).toSet
    val exact = ids(0)
    val probed = ids(290)
    assert(exact.contains(0L) && probed.contains(0L))
    assert(exact.subsetOf(probed))
    assert(probed.size > exact.size,
      s"multiprobe added nothing at bits=32 (exact=${exact.size})")
  }

  test("IVF: probe path returns the nearest vector") {
    val (assigned, cents) = Similarity.ivfIndex(corpus, "embedding", nClusters = 2, dim = 4)
    assert(assigned.columns.contains("ivf_cluster"))
    val top = Similarity.ivfTopK(
      assigned, cents, "embedding", "vec_id", vec(1, 0, 0, 0), k = 1, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L))
  }

  test("IVF centroids persist as a snapshot: save -> load -> assign/topK ≡ in-session") {
    val (assigned, cents) = Similarity.ivfIndex(corpus, "embedding", nClusters = 2, dim = 4)
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_ivf_snap").toString
    val v1 = Similarity.saveIvfCentroids(spark, warehouse, "ivf_cents", cents)
    assert(v1 == 1)
    val loaded = Similarity.loadIvfCentroids(spark, warehouse, "ivf_cents")
    assert(loaded.length == cents.length)
    loaded.zip(cents).foreach { case (a, b) => assert(a.sameElements(b)) }
    // assignment + probe from the LOADED table ≡ in-session (ORDER of
    // the centroid rows is load-bearing: first-minimum tie-break and
    // probe ranking both index into it)
    val reassigned = Similarity.ivfAssign(corpus, "embedding", loaded)
    val a0 = assigned.select("vec_id", "ivf_cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val a1 = reassigned.select("vec_id", "ivf_cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a0 == a1)
    val top = Similarity.ivfTopK(
      reassigned, loaded, "embedding", "vec_id", vec(1, 0, 0, 0), k = 1, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L))
    // a retrain publishes v2; v1 stays pinned-loadable
    val v2 = Similarity.saveIvfCentroids(
      spark, warehouse, "ivf_cents", cents.map(_.map(_ + 1.0)))
    assert(v2 == 2)
    assert(Similarity.loadIvfCentroids(spark, warehouse, "ivf_cents")
      .head.head == cents.head.head + 1.0)
    assert(Similarity.loadIvfCentroids(spark, warehouse, "ivf_cents", version = 1)
      .head.sameElements(cents.head))
    intercept[IllegalArgumentException] {
      Similarity.saveIvfCentroids(spark, warehouse, "ivf_cents", Array.empty)
    }
  }

  test("multi-table SRP: table 0 equals the single-table signature") {
    import graft.plans.HashExpressions
    val got = corpus.select(
      HashExpressions.srpSignature64(col("embedding"), 4).as("single"),
      element_at(HashExpressions.srpSignatures(col("embedding"), 4, 8), 1).as("t0"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("embeddingNearDups finds the high-cosine pair") {
    val pairs = Similarity.embeddingNearDups(
      corpus, "embedding", "vec_id", threshold = 0.99, dim = 4, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("allPairsSimilar size guard trips above maxRows, passes below") {
    val e = intercept[IllegalArgumentException] {
      Similarity.allPairsSimilar(corpus, "embedding", "vec_id",
        threshold = 0.5, maxRows = 3)
    }
    assert(e.getMessage.contains("embeddingNearDups"))
    // within bounds: runs and returns qualifying pairs
    assert(Similarity.allPairsSimilar(corpus, "embedding", "vec_id",
      threshold = 0.99).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((1L, 5L)))
  }

  test("clusters over LSH edges equal clusters over exact edges") {
    // the q69 gate's equivalence property at spec scale: deterministic
    // planes + enough tables make the LSH edge set connectivity-complete
    val exact = graft.operators.Dedup.clusters(
      Similarity.allPairsSimilar(corpus, "embedding", "vec_id", threshold = 0.9))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = graft.operators.Dedup.clusters(
      Similarity.embeddingNearDups(corpus, "embedding", "vec_id",
        threshold = 0.9, dim = 4, bits = 4, tables = 64))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsh == exact)
  }

  test("semDeDup drops exactly the planted within-cluster semantic copies") {
    // three well-separated directions; members perturbed well below the
    // 1 - eps threshold; exact copies planted with HIGHER ids
    def member(axis: Int, j: Int): Seq[Float] = {
      val v = Array.fill(8)(0.0)
      v(axis) = 10.0
      // each member lights a DIFFERENT spread dim: intra-cluster cosine
      // is exactly 100/125 = 0.8, far from the 0.99 threshold (a
      // magnitude-varying spread on a shared dim creeps past 0.99)
      v((axis + 3 + j) % 8) = 5.0
      v.toSeq.map(_.toFloat)
    }
    val base = for (axis <- Seq(0, 1, 2); j <- 0 until 4)
      yield ((axis * 10 + j).toLong, member(axis, j))
    val copies = Seq( // exact duplicates of (0,1) and (1,2)
      (100L, member(0, 1)), (101L, member(1, 2)))
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(df, "embedding", "vec_id",
      nClusters = 3, dim = 8, eps = 0.01)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(got.size == base.size + copies.size) // every row emitted
    // copies dropped, their originals and everything else kept
    assert(!got(100L)._2 && !got(101L)._2)
    (base.map(_._1)).foreach(id => assert(got(id)._2, s"id $id"))
    // a copy shares its original's cluster (assignment is a pure
    // function of the vector)
    assert(got(100L)._1 == got(1L)._1)
    assert(got(101L)._1 == got(12L)._1)
    // invariant to input partitioning (well-separated: no pair near
    // the threshold, so float drift cannot flip a keep)
    val again = Similarity.semDeDup(df.repartition(7), "embedding", "vec_id",
      nClusters = 3, dim = 8, eps = 0.01)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(again == got.map { case (k, v) => k -> v._2 })
  }

  test("semDeDup routes null-vector rows through with keep = true") {
    // norm(null) is null: without the explicit null branch these rows
    // fail BOTH identity-guard filters and vanish from the output
    def axis(i: Int): Seq[Float] = {
      val v = Array.fill(8)(0.0f); v(i) = 10.0f; v.toSeq
    }
    val withVec = Seq((1L, axis(0)), (2L, axis(1)), (3L, axis(0)))
      .toDF("vec_id", "embedding")
    val nulls = Seq(50L, 51L).toDF("vec_id")
      .withColumn("embedding",
        lit(null).cast("array<float>"))
    val got = Similarity.semDeDup(withVec.unionByName(nulls),
      "embedding", "vec_id", nClusters = 2, dim = 8, eps = 0.01)
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.getBoolean(2))).toMap
    assert(got.size == 5) // every input row accounted, nulls included
    assert(got(50L) == (true, true) && got(51L) == (true, true))
    assert(got(1L)._2 && got(2L)._2 && !got(3L)._2) // dedup unaffected
  }

  test("semDeDup keep-first: the LOWER id of a duplicate pair survives") {
    val v = Seq.fill(8)(1.0f)
    val df = Seq((5L, v), (2L, v), (9L, v), (7L, Seq.fill(8)(0.0f) :+ 1.0f))
      .map { case (i, x) => (i, x.take(8)) }.toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(df, "embedding", "vec_id",
      nClusters = 2, dim = 8, eps = 0.05)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got(2L) && !got(5L) && !got(9L)) // min id keeps of the triple
    assert(got(7L)) // lone vector untouched
  }

  test("semDeDup mass-copy guard: a huge identical copy-set never reaches the pair search") {
    // 500 byte-identical copies of ONE page + a handful of distinct
    // vectors: pre-guard this put a 500-member set into one cluster and
    // the pair search went O(copies²) on a single key; post-guard only
    // ONE representative of the copy-set enters the self-join. The
    // planted truth is closed-form either way: min-id copy + the
    // distinct vectors keep, all other copies drop.
    def axis(i: Int, scale: Double): Seq[Float] = {
      val v = Array.fill(8)(0.0f); v(i) = scale.toFloat; v.toSeq
    }
    val page = axis(0, 10.0)
    val copies = (0 until 500).map(j => (1000L + j, page))
    val distinctOnes = Seq((1L, axis(1, 7.0)), (2L, axis(2, 5.0)), (3L, axis(3, 9.0)))
    val zeros = Seq((600L, Seq.fill(8)(0.0f)), (601L, Seq.fill(8)(0.0f)))
    val df = (copies ++ distinctOnes ++ zeros).toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(df, "embedding", "vec_id",
      nClusters = 4, dim = 8, eps = 0.01)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(got.size == 505) // every row emitted exactly once
    assert(got(1000L)._2) // min-id copy survives
    (1001L until 1500L).foreach(id => assert(!got(id)._2, s"copy $id"))
    Seq(1L, 2L, 3L).foreach(id => assert(got(id)._2, s"distinct $id"))
    // identical ZERO vectors are exempt: cosine is defined 0, so they
    // never drop each other (collapsing them would change the answer)
    assert(got(600L)._2 && got(601L)._2)
    // copies share the representative's cluster
    (1001L until 1500L).foreach(id => assert(got(id)._1 == got(1000L)._1))
  }

  test("semanticDecontaminate flags exactly the planted near-bench vectors") {
    val bench = Seq((100L, vec(1, 0, 0, 0)), (101L, vec(0, 0, 1, 0)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (1L, vec(0.9, 0.1, 0, 0)), // ~0.994 to bench 100 → contaminated
      (2L, vec(0, 1, 0, 0)), // orthogonal to both → clean
      (3L, vec(0, 0.1, 0.9, 0)), // ~0.994 to bench 101 → contaminated
      (4L, vec(-1, 0, 0, 0))) // negative cos → clean
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontaminate(
      train, bench, "embedding", "vec_id", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L)) // every train row, exactly once
    assert(got(1L)._2 && got(3L)._2 && !got(2L)._2 && !got(4L)._2)
    // float32 storage: compare at float precision, not double
    assert(math.abs(got(1L)._1 - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-6)
    // max over BOTH bench vectors: cos to 100 is -1, to 101 is 0 → 0
    assert(got(4L)._1 == 0.0)
  }

  test("semanticDecontaminate keeps every train row against an empty bench") {
    val train = Seq((1L, vec(1, 0, 0, 0)), (2L, vec(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val bench = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontaminate(
      train, bench, "embedding", "vec_id", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.getBoolean(2))).toMap
    assert(got == Map(1L -> (true, false), 2L -> (true, false)))
  }

  test("semanticDecontaminate: null train embedding → false flag, not null") {
    val train = Seq((1L, Some(vec(1, 0, 0, 0))), (2L, None))
      .toDF("vec_id", "embedding")
    val bench = Seq((100L, vec(1, 0, 0, 0))).toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontaminate(
      train, bench, "embedding", "vec_id", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.getBoolean(2))).toMap
    assert(got(1L) == (false, true))
    assert(got(2L) == (true, false)) // null vec: no cos, flag still false
  }

  test("semanticDecontaminateLsh agrees with the exact path (q124 property)") {
    // the q69-style equivalence at spec scale: enough tables make the
    // prefilter argmax-complete for the planted high-cosine pairs, so
    // flag and contaminated-row max_sim match the exhaustive path; clean
    // rows compare flag-only (candidate-max is LSH-dependent by contract)
    val bench = Seq((100L, vec(1, 0, 0, 0)), (101L, vec(0, 0, 1, 0)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (1L, vec(0.9, 0.1, 0, 0)),
      (2L, vec(0, 1, 0, 0)),
      (3L, vec(0, 0.1, 0.9, 0)),
      (4L, vec(-1, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.semanticDecontaminate(
      train, bench, "embedding", "vec_id", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val lsh = Similarity.semanticDecontaminateLsh(
      train, bench, "embedding", "vec_id", threshold = 0.9,
      bits = 4, tables = 64)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1), r.getBoolean(2))).toMap
    assert(lsh.keySet == exact.keySet) // every train row emitted
    exact.foreach { case (id, (sim, flag)) =>
      assert(lsh(id)._2 == flag, s"flag mismatch for $id")
      if (flag) assert(lsh(id)._1 == sim, s"contaminated max_sim for $id")
    }
  }
}
