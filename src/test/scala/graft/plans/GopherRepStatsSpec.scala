package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized equivalence for the fused repetition-stats expression:
  * a code-independent Scala replica (regex splits + groupBy counting —
  * nothing shared with the expression's single-pass scans) must agree
  * on every one of the 16 counts over generated texts that mix word
  * collisions, blank lines, paragraph breaks, and edge-space padding.
  * The crafted-page and threshold cases live in CorpusSpec; this pins
  * the COUNTING itself across the input space.
  */
class GopherRepStatsSpec extends SparkSpec {
  import spark.implicits._

  private def replica(text: String): Seq[Long] = {
    val words = text.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
    val lines = text.split("\n", -1).toSeq
      .map(_.replaceAll("^ +", "").replaceAll(" +$", "")).filter(_.nonEmpty)
    val paras = text.split("\n{2,}", -1).toSeq
      .map(_.replaceAll("^ +", "").replaceAll(" +$", "")).filter(_.nonEmpty)
    def dup(items: Seq[String]): (Long, Long, Long) = {
      val c = items.groupBy(identity).map { case (v, o) => v -> o.size.toLong }
      (items.size.toLong,
        c.values.filter(_ >= 2L).map(_ - 1L).sum,
        c.collect { case (v, n) if n >= 2L => v.length.toLong * (n - 1L) }.sum)
    }
    val (nl, dl, dlc) = dup(lines)
    val (np, dp, dpc) = dup(paras)
    def gram(g: Int): (Long, Long) =
      if (words.size < g) (0L, 0L)
      else {
        val c = words.sliding(g).map(_.mkString(" ")).toSeq
          .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
        val mc = c.values.max
        val top =
          if (mc >= 2L)
            mc * c.collect { case (k, n) if n == mc => k.length.toLong }.max
          else 0L
        (top, c.collect { case (k, n) if n >= 2L => k.length.toLong * n }.sum)
      }
    val tops = (2 to 4).map(gram(_)._1)
    val dups = (5 to 10).map(gram(_)._2)
    Seq(nl, dl, dlc, np, dp, dpc, text.length.toLong) ++ tops ++ dups
  }

  test("random texts: expression counts equal the independent replica") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Seq("aa", "bb", "cc", "the", "and", "x", "longerword", "-")
    val sep = Gen.frequency(
      6 -> Gen.const(" "),
      2 -> Gen.const("\n"),
      1 -> Gen.const("\n\n"),
      1 -> Gen.const("  "),
      1 -> Gen.const(" \n "),
      1 -> Gen.const("\n\n\n"))
    val gen = for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
      ss <- Gen.listOfN(math.max(n - 1, 0), sep)
      lead <- Gen.oneOf("", " ", "\n")
      trail <- Gen.oneOf("", " ", "\n", ".")
    } yield lead + (ws.zipAll(ss, "", "").flatMap {
      case (w, s) => Seq(w, s)
    }.mkString) + trail
    val samples = (0 until 300).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))).distinct
    val got = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), GopherRepStatsExpr(col("text")).as("s"))
      .select(col("id") +: GopherRepStatsExpr.schema.fieldNames.toSeq
        .map(f => col(s"s.$f")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toSeq)
      .toMap
    samples.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == replica(t),
        s"counts diverged for ${t.replace("\n", "\\n")}")
    }
  }
}
