package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules — the validation layer an ETL load
  * runs before committing a batch (the reference's load path defers all
  * validation to PostgreSQL cast errors mid-INSERT; here rules are
  * checked up front, in one pass, with per-rule violation counts).
  *
  * Row-local rules (not-null / range / set / regex) fold into a SINGLE
  * aggregation over the data — one scan regardless of rule count, each
  * rule one `sum(when(...))` slot. Cross-row rules cost what they
  * fundamentally cost: `Unique` one distinct-count aggregation,
  * `RefIntegrity` one anti-join against the (broadcastable) dimension.
  * Output: (rule, violations, total) — integer counts, engine-portable.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** Fails rows where `column` is null. */
  final case class NotNull(column: String) extends Rule {
    def name = s"not_null($column)"
  }

  /** Fails non-null rows outside [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
    extends Rule {
    def name = s"in_range($column)"
  }

  /** Fails non-null rows whose value is not in `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    def name = s"in_set($column)"
  }

  /** Fails non-null rows where `regex` does not match. SQL `rlike`
    * semantics: a SUBSTRING search — anchor with `^...$` for full-value
    * validation (Java∩RE2-portable patterns only, per the
    * shared-regex-subset rule).
    */
  final case class MatchesRe(column: String, regex: String) extends Rule {
    def name = s"matches($column)"
  }

  /** Fails every row beyond the first in a duplicate key group.
    * Violations = total non-null-key rows − distinct keys.
    */
  final case class Unique(column: String) extends Rule {
    def name = s"unique($column)"
  }

  /** Fails rows whose key has no match in the dimension (orphan FKs). */
  final case class RefIntegrity(column: String, dim: DataFrame,
      dimColumn: String) extends Rule {
    def name = s"ref($column)"
  }

  private def violated(r: Rule): Column = r match {
    case NotNull(c) => Cleanse.colRef(c).isNull
    case InRange(c, lo, hi) =>
      Cleanse.colRef(c).isNotNull &&
        (Cleanse.colRef(c) < lo || Cleanse.colRef(c) > hi)
    case InSet(c, vs) =>
      Cleanse.colRef(c).isNotNull && !Cleanse.colRef(c).isin(vs: _*)
    case MatchesRe(c, re) =>
      Cleanse.colRef(c).isNotNull && !Cleanse.colRef(c).rlike(re)
    case _ => lit(false) // cross-row rules have dedicated plans
  }

  /** One row per rule: (rule, violations, total). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val rowLocal = rules.filter {
      case _: Unique | _: RefIntegrity => false
      case _ => true
    }
    val frames = Seq.newBuilder[DataFrame]
    if (rowLocal.nonEmpty) {
      // ONE scan for every row-local rule: a single aggregation carries
      // one count slot per rule, and the 1-row result explodes into
      // per-rule rows. (Selecting each slot from the agg in separate
      // union branches would replan — and re-scan — the aggregation
      // once per rule: measured 4 full scans for 4 rules.)
      val slots = rowLocal.zipWithIndex.map { case (r, i) =>
        // coalesce: sum over an EMPTY batch is null, and an empty batch
        // must report 0 violations, not null
        coalesce(sum(when(violated(r), 1L).otherwise(0L)), lit(0L))
          .as(s"_v$i")
      } :+ count(lit(1)).as("_total")
      val agg = df.agg(slots.head, slots.tail: _*)
      val pairs = array(rowLocal.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"_v$i").as("violations"))
      }: _*)
      frames += agg
        .select(explode(pairs).as("_p"), col("_total").as("total"))
        .select(col("_p.rule").as("rule"),
          col("_p.violations").as("violations"), col("total"))
    }
    // lazy denominator: a 1-row count frame cross-joined into each
    // cross-row rule row. Keeps check() side-effect-free (no eager job
    // at plan-build time) and every rule's `total` evaluates against
    // the same source at the same time as its violation count.
    lazy val totalFrame = df.agg(count(lit(1)).as("total"))
    rules.foreach {
      case Unique(c) =>
        val k = Cleanse.colRef(c)
        frames += df.filter(k.isNotNull)
          .agg((count(lit(1)) - countDistinct(k)).as("violations"))
          .select(lit(s"unique($c)").as("rule"), col("violations"))
          .crossJoin(totalFrame)
      case RefIntegrity(c, dim, dc) =>
        val orphans = df.filter(Cleanse.colRef(c).isNotNull)
          .join(broadcast(dim.select(Cleanse.colRef(dc).as("_k")).distinct()),
            Cleanse.colRef(c) === col("_k"), "left_anti")
        frames += orphans
          .agg(count(lit(1)).as("violations"))
          .select(lit(s"ref($c)").as("rule"), col("violations"))
          .crossJoin(totalFrame)
      case _ => ()
    }
    frames.result().reduce(_.union(_))
  }
}
