package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), per the large-pipeline extension plan:
  *
  *   - brute-force cosine top-k: the exact baseline. One pass, no
  *     shuffle for a single query (the query vector is a literal in the
  *     plan); per-partition top-k via TakeOrderedAndProject.
  *   - LSH (random hyperplane / sign-random-projection): n-bit signature,
  *     bucket join, exact re-rank inside buckets — the scale path:
  *     candidate generation touches only same-bucket rows.
  *   - IVF (inverted-file): k-means centroids (sampled train), assign
  *     each vector to its nearest centroid at write time, probe the
  *     `nprobe` nearest centroids at query time → scan only
  *     nprobe/k of the corpus.
  *
  * The dot product is a sequential higher-order fold (`aggregate` over
  * `zip_with`) in double precision — codegen'd, deterministic order, and
  * bit-identical to the DuckDB oracle's list_sum/list_transform
  * evaluation (verified empirically; both are left-to-right double
  * accumulation).
  */
object Similarity {

  /** Deterministic sequential-double dot product of two float vectors —
    * fused JVM expression (a higher-order `aggregate(zip_with(...))`
    * formulation has the same fold order but evaluates the lambda
    * interpreted, measured ~10× slower); bit-identical to DuckDB's
    * list_sum(list_transform(...)).
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.HashExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Exact top-k neighbors of one query vector (as a plan literal —
    * broadcast-free, shuffle-free scan + TakeOrderedAndProject).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      query: Seq[Float],
      k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    corpus
      .select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact top-k per query row against the corpus: broadcast the (small)
    * query set, cosine per pair, rank window per query. For a large query
    * set, swap broadcast direction or use [[lshTopK]].
    */
  def crossTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("cvec"), col("qvec")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("corpus_id"), col("sim"))
  }

  /** Random-hyperplane signature: `bits` sign bits packed into a long.
    * Hyperplane h_i is a deterministic pseudo-random ±1 vector derived
    * from splitmix64(i, dim-index) — reproducible across sessions with
    * no stored model. (±1 projections are the standard cheap SRP
    * variant.)
    */
  def srpSignature(vec: Column, dim: Int, bits: Int = 16): Column = {
    require(bits <= 64)
    // fused one-pass expression: all `bits` projections accumulate while
    // scanning the vector once (the per-bit fold formulation pays `bits`
    // interpreted array traversals)
    graft.plans.HashExpressions.srpSignature64(vec, bits)
  }

  private def planes(i: Int, dim: Int): Seq[Double] = {
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    (0 until dim).map(j => if (splitmix(i.toLong * 131071 + j) >= 0) 1.0 else -1.0)
  }

  /** ANN top-k via SRP-LSH: bucket by signature, exact cosine re-rank
    * within the query's bucket (+ optional 1-bit multiprobe neighbors).
    * Recall < 1 by construction; raise `bits` ↓bucket size, raise
    * `probes` ↑recall.
    */
  def lshTopK(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      query: Seq[Float],
      k: Int,
      dim: Int,
      bits: Int = 12,
      probes: Int = 4): DataFrame = {
    // planes are indexed by the REAL vector dimension: srpSignature64
    // projects over each corpus vector's full length, so the driver-side
    // query signature must use query.length — a mismatched `dim` would
    // silently project different components and collapse recall to ~0
    require(dim == query.length,
      s"dim ($dim) must equal the query vector length (${query.length})")
    val sigged = corpus.select(
      col(idCol), col(vecCol),
      srpSignature(col(vecCol), dim, bits).as("bucket"))
    // query signature computed driver-side with the same planes
    val projs = (0 until bits).map { i =>
      val p = planes(i, query.length)
      query.zip(p).map { case (x, s) => x.toDouble * s }.sum
    }
    val qsig = projs.zipWithIndex
      .collect { case (proj, i) if proj >= 0 => 1L << i }.sum
    // QUERY-DIRECTED multiprobe (the Lv et al. VLDB'07 argument): a true
    // neighbor most likely lands across the hyperplanes the query is
    // CLOSEST to, so probe buckets are ranked by perturbation cost —
    // single and pair flips of the smallest-|margin| bits, cheapest
    // first. (Flipping by bit INDEX, the previous rule, probes buckets
    // unrelated to the query's geometry: measured recall@10 0.08 → 0.13
    // at probes=4 on the sf0.1 embeddings; the full recall/probes curve
    // is in docs/SCALE.md — on structureless vectors recall is bounded
    // by scan fraction, so size `probes` from that table, it is the
    // recall knob.)
    val ranked = projs.zipWithIndex
      .map { case (proj, i) => (i, proj * proj) }.sortBy(_._2)
    val singles = ranked.map { case (i, c) => (Seq(i), c) }
    val lim = math.min(bits, 12) // multi-flips from the 12 cheapest bits
    val pairs = for {
      a <- 0 until lim; b <- (a + 1) until lim
    } yield (Seq(ranked(a)._1, ranked(b)._1), ranked(a)._2 + ranked(b)._2)
    // triples keep `probes` a working knob past the pair limit (at
    // bits=8: 8+28 ≤2-flip buckets, +56 triples → probes up to 92)
    val triples = for {
      a <- 0 until lim; b <- (a + 1) until lim; c <- (b + 1) until lim
    } yield (Seq(ranked(a)._1, ranked(b)._1, ranked(c)._1),
      ranked(a)._2 + ranked(b)._2 + ranked(c)._2)
    // bucket-count cap as a Long: `(1 << bits) - 1` is an Int shift that
    // wraps for bits ≥ 31 (bits=32 → 0), which would silently drop every
    // perturbation and degrade multiprobe to the exact bucket only
    val maxProbes =
      if (bits >= 31) Int.MaxValue else (1 << bits) - 1
    val probeSigs = qsig +: (singles ++ pairs ++ triples).sortBy(_._2)
      .take(math.min(probes, maxProbes))
      .map { case (idxs, _) => idxs.foldLeft(qsig)((s, i) => s ^ (1L << i)) }
    val q = array(query.map(lit): _*)
    sigged
      .filter(col("bucket").isin(probeSigs: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF index: sample-trained k-means centroids (Lloyd's, driver-side on
    * a bounded sample — the standard IVF train recipe), then a cluster
    * assignment column. Returns (assignedCorpus, centroids).
    */
  def ivfIndex(
      corpus: DataFrame,
      vecCol: String,
      nClusters: Int,
      dim: Int,
      sampleSize: Int = 10000,
      iters: Int = 10): (DataFrame, Array[Array[Double]]) = {
    val (assigned, cents, _) =
      ivfIndexWithStats(corpus, vecCol, nClusters, dim, sampleSize, iters)
    (assigned, cents)
  }

  /** [[ivfIndex]] plus the FINAL iteration's per-centroid SAMPLE counts
    * — a free driver-side skew estimate (the counts already exist in
    * the Lloyd's loop) that lets [[semDeDup]] decide whether its pair
    * search needs the block-split census at all.
    */
  private[operators] def ivfIndexWithStats(
      corpus: DataFrame,
      vecCol: String,
      nClusters: Int,
      dim: Int,
      sampleSize: Int = 10000,
      iters: Int = 10): (DataFrame, Array[Array[Double]], Array[Int]) = {
    val sample = corpus.select(col(vecCol)).limit(sampleSize).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val k = math.min(nClusters, sample.length)
    var centroids = sample.take(k).map(_.clone)
    var it = 0
    // Round 20: the nearest-centroid scan is ~97% of each Lloyd's
    // iteration (k·dim ops/point vs dim for the sum) and embarrassingly
    // parallel, so it fans across driver cores; the centroid SUMS then
    // accumulate SEQUENTIALLY in sample order off the precomputed
    // assignment — bit-identical results to the old fused loop (same
    // additions in the same order), ~10× less driver wall at dim 256
    // (q139's Lloyd's measured 2.1 s single-threaded).
    val assign = new Array[Int](sample.length)
    var lastCounts = new Array[Int](math.max(k, 1))
    while (it < iters) {
      val cents = centroids
      java.util.stream.IntStream.range(0, sample.length).parallel()
        .forEach(i => assign(i) = nearest(sample(i), cents))
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var si = 0
      while (si < sample.length) {
        val c = assign(si)
        val v = sample(si)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
        si += 1
      }
      centroids = sums.zipWithIndex.map { case (s, i) =>
        if (counts(i) == 0) centroids(i)
        else s.map(_ / counts(i))
      }
      lastCounts = counts
      it += 1
    }
    val cents = centroids
    val assigned = corpus.withColumn("ivf_cluster", nearestCentroidCol(col(vecCol), cents))
    (assigned, cents, lastCounts)
  }

  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      var d = 0.0
      var j = 0
      while (j < v.length) { val t = v(j) - cents(i)(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Nearest-centroid assignment as ONE fused expression (argmin of
    * squared L2 over the centroid table in a single JVM loop per row).
    * Same distances and first-minimum tie-breaking as the earlier
    * transform/aggregate + array_position(array_min) formulation, without
    * its per-centroid interpreted lambda evaluation.
    */
  private def nearestCentroidCol(vec: Column, cents: Array[Array[Double]]): Column =
    graft.plans.HashExpressions.nearestCentroid(vec, cents)

  /** Assign a corpus to an EXISTING centroid table (a loaded index) —
    * the inference half of [[ivfIndex]] without the training scan, so
    * a production deployment trains once and every later session
    * assigns + probes from the persisted artifact.
    */
  def ivfAssign(
      corpus: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "centroid table must be non-empty")
    corpus.withColumn("ivf_cluster", nearestCentroidCol(col(vecCol), centroids))
  }

  /** Persist a trained IVF centroid table as a VERSIONED snapshot
    * ([[graft.sink.Snapshots]] posture — staged write, manifest,
    * atomic pointer flip): index training ([[ivfIndex]]'s sampled
    * Lloyd's) is order-sensitive and corpus-sensitive, so a retrain on
    * a since-grown corpus silently re-shapes every cluster and every
    * probe route — production trains ONCE, later batch runs /
    * streaming probes / replica sessions LOAD. `cluster_id` is stored
    * explicitly: [[ivfTopK]]'s probe ranking and
    * [[graft.plans.HashExpressions.nearestCentroid]]'s first-minimum
    * tie-break both depend on centroid ORDER, and parquet row order is
    * not a contract. Returns the published version.
    */
  def saveIvfCentroids(
      spark: org.apache.spark.sql.SparkSession,
      warehouse: String,
      table: String,
      centroids: Array[Array[Double]]): Int = {
    require(centroids.nonEmpty, "refusing to publish an empty centroid table")
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cluster_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        nullable = false)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      centroids.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row(i, c.toSeq): org.apache.spark.sql.Row
      }.toSeq.asJava
    graft.sink.Snapshots.publish(
      spark, warehouse, table, spark.createDataFrame(rows, schema))
  }

  /** Load a persisted IVF centroid table (current version, or a pinned
    * `version` for reproducing an old run's probe routes) back into the
    * order-faithful form [[ivfAssign]]/[[ivfTopK]] consume. The collect
    * is bounded by nClusters (16–65k for real indexes), never
    * corpus-sized.
    */
  def loadIvfCentroids(
      spark: org.apache.spark.sql.SparkSession,
      warehouse: String,
      table: String,
      version: Int = -1): Array[Array[Double]] = {
    val df =
      if (version < 0) graft.sink.Snapshots.current(spark, warehouse, table)
      else graft.sink.Snapshots.version(spark, warehouse, table, version)
    df.orderBy(col("cluster_id"))
      .select(col("centroid"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
  }

  /** IVF query: probe the nprobe nearest clusters only. */
  def ivfTopK(
      assigned: DataFrame,
      centroids: Array[Array[Double]],
      vecCol: String,
      idCol: String,
      query: Seq[Float],
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val qd = query.map(_.toDouble).toArray
    val probeClusters = centroids.zipWithIndex
      .map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < qd.length) { val t = qd(j) - c(j); d += t * t; j += 1 }
        (i, d)
      }
      .sortBy(_._2).take(nprobe).map(_._1)
    val q = array(query.map(lit): _*)
    assigned
      .filter(col("ivf_cluster").isin(probeClusters.toIndexedSeq: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact all-pairs similarity: every (id_a < id_b) pair with cosine ≥
    * threshold. O(n²) by definition — the correctness baseline (and the
    * oracle-checkable face of embedding dedup); [[embeddingNearDups]] is
    * the scale path, approximating this with LSH-bounded candidate
    * volume. The inequality self-join broadcasts the smaller side
    * (BroadcastNestedLoopJoin), so pair generation distributes over the
    * big side's partitions.
    *
    * GUARDED against accidental large-corpus use: a row-count probe
    * refuses corpora above `maxRows` (default 100k ⇒ ≤5e9 pair evals,
    * the edge of single-cluster sanity) with a pointer to
    * [[embeddingNearDups]] — the same philosophy as Dedup's `maxBucket`
    * cap. The probe is eager but BOUNDED: `limit(maxRows+1).count()`
    * stops scanning once the cap is disproven, so an expensive derived
    * corpus (e.g. a featurize pipeline) pays at most maxRows+1 rows of
    * recompute for the check, never a second full pass.
    */
  def allPairsSimilar(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      maxRows: Long = 100000L): DataFrame = {
    val probeCap = math.min(maxRows, Int.MaxValue - 1L).toInt + 1
    val n = corpus.limit(probeCap).count()
    require(n <= maxRows,
      s"allPairsSimilar is O(n²): corpus has >$maxRows rows (maxRows=$maxRows). " +
        "Use embeddingNearDups (LSH-blocked) for large corpora, or raise " +
        "maxRows explicitly if the quadratic cost is intended.")
    // Three per-pair cost levers, all applied: (1) norms once per VECTOR
    // (not per pair); (2) vectors pre-cast to array<double> in the side
    // projections, so the fused dot's internal cast is a no-op instead
    // of allocating two fresh double arrays per evaluated pair; (3) the
    // threshold predicate INSIDE the join condition, so the nested-loop
    // join emits only qualifying pairs instead of materializing all
    // n²/2 joined rows for a post-filter. (29s → ~1.5s at sf0.1.)
    // No broadcast hint: both sides are the SAME corpus, so the hint
    // buys nothing and would force-broadcast past safe limits for a
    // large corpus; Catalyst broadcasts small inputs on its own and
    // falls back to a distributed cartesian otherwise (at which point
    // embeddingNearDups is the right operator anyway).
    val vd = col(vecCol).cast("array<double>")
    val a = corpus.select(
      col(idCol).as("id_a"), vd.as("v_a"), norm(vd).as("n_a"))
    val b = corpus.select(
      col(idCol).as("id_b"), vd.as("v_b"), norm(vd).as("n_b"))
    val denom = col("n_a") * col("n_b")
    val cos = when(denom === 0.0, lit(0.0)).otherwise(dot(col("v_a"), col("v_b")) / denom)
    a.join(b, col("id_a") < col("id_b") && cos >= threshold)
      .select(col("id_a"), col("id_b"), cos.as("cos"))
  }

  /** Embedding near-duplicates: all pairs with cosine ≥ threshold, via
    * multi-table SRP-LSH blocking + exact verify (the embedding-cosine
    * dedup path). Recall for a pair at angle θ is
    * 1 − (1 − (1 − θ/π)^bits)^tables — single-table 8-bit SRP catches
    * ~30% of cosine-0.9 pairs, 16 tables catch ~99.7%. All `tables`
    * signatures come from one fused pass over the vector; candidates are
    * a bucket join per table, deduped across tables by the final
    * distinct (pair volume, not corpus volume).
    */
  def embeddingNearDups(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      dim: Int,
      bits: Int = 8,
      tables: Int = 8): DataFrame = {
    // Same per-pair levers as allPairsSimilar: vectors pre-cast to
    // array<double> and norms computed once per VECTOR before the
    // bucket join, with the cosine threshold inside the join condition —
    // same-bucket pairs that fail it are rejected during the join
    // instead of materializing for a post-filter, so the final distinct
    // deduplicates only QUALIFYING pairs across tables.
    //
    // The cast/norm projection sits in its OWN select below the
    // posexplode: a single combined select analyzes into
    // Project(above) ← Generate ← scan, which evaluates norm once per
    // EXPLODED row — `tables`× redundant work (the CollapseProject trap;
    // verified in the physical plan). A Generate between the two
    // projections pins the norm below the explosion.
    val vd = col(vecCol).cast("array<double>")
    val prepped = corpus.select(
      col(idCol).as("id"), vd.as("v"), norm(vd).as("nrm"))
    val sigged = prepped.select(
      col("id"), col("v"), col("nrm"),
      posexplode(graft.plans.HashExpressions.srpSignatures(col("v"), bits, tables))
        .as(Seq("tbl", "sig")))
    val l = sigged.select(col("tbl").as("tbl_a"), col("sig").as("sig_a"),
      col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val r = sigged.select(col("tbl").as("tbl_b"), col("sig").as("sig_b"),
      col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    val denom = col("n_a") * col("n_b")
    val cos = when(denom === 0.0, lit(0.0)).otherwise(dot(col("v_a"), col("v_b")) / denom)
    l.join(r,
      col("tbl_a") === col("tbl_b") && col("sig_a") === col("sig_b") &&
        col("id_a") < col("id_b") && cos >= threshold)
      .select(col("id_a"), col("id_b"), cos.as("cos"))
      .distinct()
  }

  /** Embedding-level benchmark decontamination: for every `train` row,
    * the max cosine similarity to ANY `bench` row, plus the flag
    * `max_sim >= threshold`. This is the semantic complement to the
    * n-gram paths ([[graft.operators.Corpus.contaminationCounts]] /
    * `bloomDecontaminate`): paraphrased or lightly-reworded eval
    * leakage shares few exact 8-grams but keeps a near-identical
    * embedding, so modern curation runs BOTH filters.
    *
    * Every train row is emitted exactly once — including against an
    * EMPTY bench (a left nested-loop join, not a cross join, so clean
    * corpora survive a benchmark set that happens to be empty:
    * `max_sim = null, contaminated = false`). A train row whose own
    * embedding is null likewise reports `max_sim = null,
    * contaminated = false` rather than a null flag — callers
    * anti-filter on the flag, and a null there silently drops the row.
    * Scale shape: eval suites are thousands of rows against a corpus of
    * billions, so the bench side broadcasts (same posture as
    * [[crossTopK]]); the train side is one scan with per-partition
    * partial max, and the only shuffle moves slim `(id, partial max)`
    * rows. A bench too large to broadcast uses
    * [[semanticDecontaminateLsh]]'s bucketed prefilter instead of this
    * exact path. max() over doubles is order-insensitive, so the
    * output is deterministic under any partitioning.
    */
  def semanticDecontaminate(
      train: DataFrame,
      bench: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double): DataFrame = {
    val t = train.select(col(idCol).as("id"), col(vecCol).as("tvec"))
    val b = bench.select(col(vecCol).as("bvec"))
    // left + always-true condition ≡ cross join when bench is non-empty
    // (same BroadcastNestedLoopJoin physical plan, outer build side),
    // but keeps every train row when it is empty.
    t.join(broadcast(b), lit(true), "left")
      .groupBy(col("id"))
      .agg(max(cosine(col("tvec"), col("bvec"))).as("max_sim"))
      .withColumn("contaminated", coalesce(col("max_sim") >= threshold, lit(false)))
  }

  /** [[semanticDecontaminate]] for a bench set too large to broadcast:
    * multi-table SRP-LSH prefilter → exact cosine verify on candidates
    * only (the [[embeddingNearDups]] posture applied to the
    * train-vs-bench bipartite problem). Candidate generation is an
    * equi-join on `(table, signature)` — a keyed shuffle both sides
    * partition by, never a cross product — so the pair volume scales
    * with bucket collisions, not `|train| × |bench|`.
    *
    * Contract differences vs the exact path, both inherent to LSH:
    *  - `max_sim` is the max over VERIFIED CANDIDATES (null when no
    *    bench row shares a bucket) — for a contaminated row it equals
    *    the true max whenever the argmax pair collides in ≥ 1 of the
    *    `tables` tables, which is the recall knob: a pair at cosine c
    *    survives with prob 1 − (1 − (1 − arccos(c)/π)^bits)^tables
    *    (≈ 1 − 6e-8 at c = 0.99, bits = 8, tables = 12 — the
    *    default operating point; see docs/SCALE.md for the measured
    *    recall/scan-fraction row).
    *  - `contaminated` can false-negative only when EVERY ≥-threshold
    *    partner of a row misses all tables; exact verify means false
    *    positives are impossible.
    *
    * A pair colliding in several tables is verified once per collision;
    * the per-train max() absorbs the duplicates (bounded ×`tables`
    * work on the near-dup minority — the [[embeddingNearDups]]
    * tradeoff, which likewise verifies inside the bucket join rather
    * than shuffling vectors a second time to dedup candidates first).
    */
  def semanticDecontaminateLsh(
      train: DataFrame,
      bench: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      bits: Int = 8,
      tables: Int = 12): DataFrame = {
    // cast/norm in their own select BELOW the posexplode Generate — the
    // embeddingNearDups CollapseProject note applies verbatim (a fused
    // select would recompute norm once per exploded table row).
    val vd = col(vecCol).cast("array<double>")
    val tPrep = train.select(col(idCol).as("id"), vd.as("tvec"), norm(vd).as("t_n"))
    val tSig = tPrep.select(col("id"), col("tvec"), col("t_n"),
      posexplode(graft.plans.HashExpressions.srpSignatures(col("tvec"), bits, tables))
        .as(Seq("tbl", "sig")))
    val bPrep = bench.select(vd.as("bvec"), norm(vd).as("b_n"))
    val bSig = bPrep.select(col("bvec"), col("b_n"),
      posexplode(graft.plans.HashExpressions.srpSignatures(col("bvec"), bits, tables))
        .as(Seq("tbl_b", "sig_b")))
    val denom = col("t_n") * col("b_n")
    val cos = when(denom === 0.0, lit(0.0)).otherwise(dot(col("tvec"), col("bvec")) / denom)
    val perId = tSig
      .join(bSig, col("tbl") === col("tbl_b") && col("sig") === col("sig_b"))
      .groupBy(col("id"))
      .agg(max(cos).as("max_sim"))
    train.select(col(idCol).as("id"))
      .join(perId, Seq("id"), "left")
      .withColumn("contaminated", coalesce(col("max_sim") >= threshold, lit(false)))
  }
  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): k-means-cluster the
    * embedding space, then remove SEMANTIC duplicates — pairs whose
    * cosine similarity is >= 1 - eps — WITHIN each cluster only. The
    * clustering is what makes web-scale dedup tractable: the quadratic
    * pair search runs per cluster (n/k rows each), never corpus-wide,
    * and k is the knob that bounds it (the paper's design point).
    *
    * Centroids come from [[ivfIndex]]'s bounded-sample Lloyd's loop
    * (the IVF train recipe — driver-local on <= sampleSize rows);
    * assignment is the fused nearest-centroid expression. Within a
    * duplicate pair the LOWER id keeps (deterministic; the paper keeps
    * the member least similar to its centroid — a ranking choice that
    * changes WHICH member survives, not how many, and would tie dedup
    * decisions to float centroid coordinates; min-id keeps the output
    * reproducible under re-clustering). Identical vectors always share
    * a cluster (assignment is a pure function of the vector), so exact
    * copies can never escape the within-cluster search — the q137
    * oracle leans on exactly that invariant.
    *
    * Emits every input row: `(id, cluster, keep)`. Float k-means means
    * cluster IDS are training-order-dependent; `keep` is stable
    * whenever no cross-cluster pair sits near the threshold (planted
    * spec + gate territory). Scale: one assignment scan + one
    * cluster-keyed self-join + a distinct on dropped ids.
    *
    * MASS-DUPLICATE GUARD (round 13): byte-identical nonzero vectors
    * collapse to one representative (min id — one vector-keyed window
    * rank) BEFORE clustering, and only representatives enter the
    * within-cluster pair search; copies take their cluster from the
    * fused nearest-centroid expression directly (assignment is a pure
    * function of the vector), so the guard costs ONE extra shuffle and
    * zero joins. This is semantics-
    * preserving, not an approximation: identical vectors co-cluster by
    * construction and sit at cosine 1 ≥ 1−eps, so every non-min copy
    * is dropped under the pair rule with NO cosine evaluated; and a
    * representative is dropped by some copy of vector w at a lower id
    * iff it is dropped by w's OWN representative (rep(w) carries w's
    * minimum id). Without the guard, a mass-duplicated page (10⁶
    * crawl copies of one document) lands its whole copy-set in ONE
    * cluster and the pair search goes O(copies²) on a single key —
    * the hot-bucket failure LSH dedup caps against. Zero vectors are
    * exempt from the guard (each is its own representative): cosine
    * involving a zero vector is defined 0 here, so identical zero
    * vectors never drop each other and collapsing them would CHANGE
    * the answer.
    */
  def semDeDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nClusters: Int,
      dim: Int,
      eps: Double = 0.01,
      sampleSize: Int = 10000,
      iters: Int = 10): DataFrame = {
    require(eps > 0 && eps < 1, "eps in (0, 1)")
    // Cached: this projection feeds THREE branches (null routing, the
    // zero-vector pass-through, and the identity-guard window). Uncached,
    // each branch re-derives the caller's full upstream — for an
    // embedText input that is an extra full embedding scan per branch
    // (the r14 q139 regression: 8.7→14 s). Operator-owned: caller
    // releases via Caches.release(), matching the `a` frame below.
    val allPts = graft.ops.Caches.owned(
      df.select(col(idCol).as("id"), col(vecCol).as("v")))
    // NULL vectors route through explicitly (keep = true, null
    // cluster): norm(null) is null, so they'd fail BOTH the zero and
    // nonzero identity-guard filters and silently vanish. A null
    // embedding carries no similarity evidence — like the zero-vector
    // exemption, it can never drop (or be dropped by) anything.
    val nullOut = allPts.filter(col("v").isNull)
      .select(col("id"), lit(null).cast("int").as("cluster"),
        lit(true).as("keep"))
    val pts = allPts.filter(col("v").isNotNull)
    val zero = norm(col("v")) === 0.0
    // identity groups among nonzero vectors: ONE window over the vector
    // value; rank 1 is the min-id representative
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v")).orderBy(col("id"))
    // cached (round 20): the identity window is evaluated by THREE
    // consumers (the ivfIndex sample collect, the assignment frame
    // below, and the non-representative copyOut branch) — uncached,
    // each re-shuffles and re-sorts the vector column (measured ~0.5 s
    // per evaluation at sf0.1's 5.7k × 256-float rows). Operator-owned,
    // released with the other frames via Caches.release().
    val ranked = graft.ops.Caches.owned(pts.filter(!zero)
      .withColumn("_gn_rn", row_number().over(w)))
    val reps = ranked.filter(col("_gn_rn") === 1).select(col("id"), col("v"))
      .unionByName(pts.filter(zero))
    val (assigned, cents, sampleCounts) =
      ivfIndexWithStats(reps, "v", nClusters, dim, sampleSize, iters)
    // norms ride the rows into the self-join: cosine(x, y) inline would
    // recompute BOTH norms per PAIR — two thirds of the pair stage's
    // flops for values that are per-row constants (the
    // embeddingNearDups precompute posture). Cached: the frame is
    // consumed by BOTH self-join sides and the reinstating join —
    // uncached, each consumer re-derives the embed/window/assignment
    // chain (the simhashNearDups cache rationale; Dedup's
    // cache-ownership note applies — caller releases via
    // Caches.release())
    val a = graft.ops.Caches.owned(
      assigned.select(col("id"), col("v"), norm(col("v")).as("_gn_n"),
        col("ivf_cluster").as("cluster")))
    val pairDenom = col("x._gn_n") * col("y._gn_n")
    val pairCos = when(pairDenom === 0.0, lit(0.0))
      .otherwise(dot(col("x.v"), col("y.v")) / pairDenom)
    // BLOCK-SPLIT pair search (round 20, guide §2.5): a bare
    // cluster-keyed self-join makes each cluster ONE join key — one
    // task owns the whole c² pair space, and AQE cannot split a single
    // key (measured: k-means over the salted q139 corpus left two
    // ~1.3k-row clusters holding 70% of all pairs in two tasks — 3.7 s
    // of a 6.5 s gate). One bounded census over the cached assignment
    // (≤ nClusters rows — the flood-guard probe posture) sizes a
    // per-cluster G = ceil(c / 512) (≤ 64) sub-block grid; rows land in
    // block pmod(xxhash64(id), G), the x side replicates to cells
    // (blk, j ≥ blk), the y side to (i ≤ blk, blk), and the join keys
    // on (cluster, cell) — per-task pair work is capped near 512², big
    // clusters split G² ways, G = 1 clusters pay exactly the old plan.
    // Every unordered pair appears in exactly ONE cell (its blocks,
    // sorted), so with the diagonal-cell id< filter + greatest() the
    // dropped-id set is IDENTICAL to the plain self-join's.
    // The census job is SKIPPED outright when the Lloyd's sample
    // already shows balanced clusters (no cluster above 4× its fair
    // share of the sample) — the free driver-side skew estimate from
    // ivfIndexWithStats. Balance means no hot join key, so the split
    // would buy nothing; the split is a perf heuristic either way
    // (split and unsplit plans produce identical dropped-id sets), so
    // a sample that underestimates a hot cluster costs time, never
    // correctness. When the census does run it is memoized per
    // (analyzed plan, knobs) — the ProbeMemo posture: bench reps /
    // repeated passes over one corpus reuse it.
    val sampleN = sampleCounts.sum
    val balanced = sampleN > 0 && sampleCounts.length > 0 &&
      sampleCounts.max.toDouble / sampleN <= 4.0 / sampleCounts.length
    val sizes: Map[String, Double] =
      if (balanced) Map.empty
      else graft.ops.ProbeMemo.cached(a,
        s"semdedup-census:$nClusters:$eps") {
        a.groupBy(col("cluster")).count().collect()
          .map(r => r.getInt(0).toString ->
            math.min(64, 1 + (r.getLong(1) - 1) / 512).toDouble).toMap
      }
    val gExpr = greatest(lit(1),
      graft.plans.HashExpressions.weightOf(
        col("cluster").cast("string"), sizes).cast("int"))
    val dropped = if (sizes.isEmpty || sizes.values.max <= 1.0) {
      // no hot cluster (or census skipped on a balanced sample):
      // exactly the plain cluster-keyed self-join — zero split overhead
      a.as("x").join(a.as("y"),
          col("x.cluster") === col("y.cluster") && col("x.id") < col("y.id"))
        .filter(pairCos >= lit(1.0 - eps))
        .select(col("y.id").as("id")).distinct()
    } else {
      val blkExpr = pmod(xxhash64(col("id")), gExpr).cast("int")
      val xSide = a.select(col("id"), col("v"), col("_gn_n"), col("cluster"),
          blkExpr.as("_gn_bi"), gExpr.as("_gn_g"))
        .withColumn("_gn_bj",
          explode(sequence(col("_gn_bi"), col("_gn_g") - 1)))
        .as("x")
      val ySide = a.select(col("id"), col("v"), col("_gn_n"), col("cluster"),
          blkExpr.as("_gn_bj"), gExpr.as("_gn_g"))
        .withColumn("_gn_bi", explode(sequence(lit(0), col("_gn_bj"))))
        .as("y")
      xSide.join(ySide,
          col("x.cluster") === col("y.cluster") &&
            col("x._gn_bi") === col("y._gn_bi") &&
            col("x._gn_bj") === col("y._gn_bj") &&
            (col("x._gn_bi") =!= col("x._gn_bj") || col("x.id") < col("y.id")) &&
            col("x.id") =!= col("y.id"))
        .filter(pairCos >= lit(1.0 - eps))
        .select(greatest(col("x.id"), col("y.id")).as("id")).distinct()
    }
    val repOut = a.join(dropped.withColumn("_gd", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(!col("_gd"), lit(true)).as("keep"))
    // non-representative copies: keep = false by the pair rule (their
    // representative is a lower-id cosine-1 partner in their own
    // cluster); their cluster is computed DIRECTLY — assignment is a
    // pure function of the (identical) vector, so no join back to the
    // representative frame is needed
    val copyOut = ranked.filter(col("_gn_rn") > 1).select(col("id"),
      graft.plans.HashExpressions.nearestCentroid(col("v"), cents).as("cluster"),
      lit(false).as("keep"))
    repOut.unionByName(copyOut).unionByName(nullOut)
  }
}
