package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The single source of truth for plan-gate exemptions (VERDICT r9 #6):
  * every query allowed to plan a SortAggregate or a GLOBAL window carries
  * its justification HERE, next to the name. `tools/PlanAudit` prints the
  * reason beside each flagged query and PlanSpec's whole-surface gate
  * consumes these exact maps — so the allowlist and its rationale cannot
  * drift apart, and a future builder touching a triaged query sees why it
  * is exempt without re-deriving the argument (SURVEY §8.7 holds the
  * long-form versions).
  *
  * Discipline: a NEW name appearing in either map needs a reason that
  * bounds the operator's input ("post-aggregate", "≤25-row dictionary",
  * "#partitions rows") — "it was in the plan" is not a reason. PlanSpec
  * additionally fails when a triaged query STOPS exhibiting the operator,
  * so stale exemptions are flushed instead of accumulating.
  */
object PlanTriage {

  /** Is this rendered `WindowExec` line a GLOBAL window (empty PARTITION
    * BY — the whole input funnels through one task)?
    *
    * `WindowExec.toString` renders up to three bracketed lists:
    * `Window [exprs], [partitionSpec], [orderSpec]` — but BOTH trailing
    * lists are optional. The r9 heuristic ("one `], [` separator ⇒
    * global") silently misclassified a PARTITIONED-but-UNORDERED window
    * (e.g. `min(x) OVER (PARTITION BY k)` — one separator, and the
    * trailing list is the partition spec) as global. The two one-separator
    * cases are distinguishable by content: an order spec always renders
    * sort directions (` ASC`/` DESC`), a partition spec never does. A
    * zero-separator `Window [exprs]` line (no partition, no order) is
    * global too.
    *
    * "Renders sort directions" is matched as the full direction+null-order
    * token pair (` ASC NULLS FIRST` etc.) Catalyst's SortOrder.toString
    * always emits — a bare ` ASC`/` DESC` substring would misread a
    * partition COLUMN whose name starts with those letters (`..., ASC_code#13]`
    * contains " ASC") as an order spec and flag a partitioned-unordered
    * window as global (ADVICE r10).
    */
  private val sortDirToken = """ (ASC|DESC) NULLS (FIRST|LAST)""".r

  def isGlobalWindowLine(line: String): Boolean =
    line.contains("Window [") && {
      val seps = "\\], \\[".r.findAllIn(line).length
      seps == 0 || (seps == 1 && {
        val last = line.substring(line.lastIndexOf("], [") + 4)
        sortDirToken.findFirstIn(last).isDefined
      })
    }

  /** Count of global-window lines in a rendered physical plan — the single
    * classifier shared by tools/PlanAudit and PlanSpec's gate. */
  def globalWindowCount(plan: String): Int =
    plan.split("\n").count(isGlobalWindowLine)

  /** Missed-pruning detector (VERDICT r10 #8): per parquet scan, the
    * columns the scan READS (its output / ReadSchema) that NO other plan
    * node ever references — silent fat scans, the IO class `.explain`
    * discipline catches by eye and this classifier catches by gate. Tree
    * walk, not string-sniffing: every AttributeReference inside every
    * non-scan node's expressions is "used", plus the plan's own result
    * output (a passthrough column is used by the caller), plus — a
    * deliberate under-approximation — everything under a positional
    * operator (Union passes children's columns BY POSITION, with no
    * expression naming them; treating its inputs as used trades missed
    * detections for zero false alarms).
    *
    * Returns (scan description, unused column names) per offending scan.
    */
  def unprunedScanColumns(plan: SparkPlan): Seq[(String, Seq[String])] = {
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val referenced = scala.collection.mutable.Set.empty[Long]
    resolved.output.foreach(a => referenced += a.exprId.id)
    resolved.foreach {
      case _: FileSourceScanExec => ()
      case u if u.nodeName == "Union" =>
        u.children.foreach(_.output.foreach(a => referenced += a.exprId.id))
      case node =>
        node.expressions.foreach(_.foreach {
          case a: AttributeReference => referenced += a.exprId.id
          case _ => ()
        })
    }
    resolved.collect { case s: FileSourceScanExec => s }.flatMap { s =>
      val unused = s.output.filterNot(a => referenced.contains(a.exprId.id))
      if (unused.isEmpty) None
      else Some((s.relation.location.rootPaths.headOption.map(_.getName)
        .getOrElse(s.nodeName), unused.map(_.name).toSeq))
    }
  }

  /** Queries whose executed plan may read a parquet column no operator
    * consumes ([[unprunedScanColumns]] hits). Same discipline as the other
    * maps: a new entry needs a reason the extra IO is bounded or
    * deliberate. (Empty as of r11 — the classifier found no silent fat
    * scan on the whole surface; it exists so new ones fail by name.) */
  val fatScan: Map[String, String] = Map.empty

  /** Queries whose executed plan may contain SortAggregate. Everywhere
    * else a SortAggregate is treated as a scale regression: it sorts its
    * whole input per partition, the r9-measured 18×-per-10× term. */
  val sortAgg: Map[String, String] = Map(
    "q_centroid_confusion" ->
      ("min_by with a generic-struct ordering, but on the POST-aggregate " +
        "(label × cell) score table — the corpus product was already " +
        "hash-combined by the quantized-sum groupBy, so the sort input is " +
        "label-cardinality, not data-sized"),
    "q_label_prop" ->
      ("min_by over per-node neighbor-vote sums (1e9-quantized) — the " +
        "ordering value is a generic type, but the input is the " +
        "POST-aggregate vote table: one row per (node, label) after the " +
        "map-side combine, bounded by degree, never the raw edge product"),
    "q_scd2" ->
      ("grouped min(STRING) — a var-length buffer is hash-ineligible, so " +
        "Spark plans SortAggregate; the downstream change-detection window " +
        "needs the same (key, ts) order, so the sort is paid once, not " +
        "added"),
    "q_scd2_lookup" ->
      ("embeds q_scd2's dimension build (same grouped min(STRING) " +
        "SortAggregate); the probe side itself is a hash join"))

  /** Queries whose executed plan may contain a GLOBAL window (no
    * PARTITION BY — the whole input funnels through one task). Legal only
    * when that input is bounded by construction. */
  val globalWindow: Map[String, String] = {
    val dimDict =
      "row_number over a distinct dictionary segment (≤25 rows at any " +
        "scale — TPC-H nation/segment/brand cardinality), the dim-build " +
        "surrogate-key assignment"
    val embedsDims =
      "embeds the dimension builds — their ≤25-row dictionary windows " +
        "(see the q_dim_* reason), not a fact-sized window"
    val twoPass =
      "two-pass offset machinery (zipWithIndexOrdered / " +
        "rankedRunningTotal): the global window runs over ONE ROW PER " +
        "PARTITION (the per-partition offsets), never over data rows"
    val bins =
      "cumulative pass over a POST-aggregate bin table (fixed bin count), " +
        "not over data rows"
    Map(
      "q_dim_categoria_cliente" -> dimDict,
      "q_dim_categoria_produto" -> dimDict,
      "q_dim_cliente" -> dimDict,
      "q_dim_fornecedor" -> dimDict,
      "q_dim_localidade" -> dimDict,
      "q_dim_loja" -> dimDict,
      "q_dim_produto" -> dimDict,
      "q_dim_promocao" -> dimDict,
      "q_dim_tempo" ->
        ("row_number over the generated 2,192-row calendar spine — fixed " +
          "size by construction (date range), not data-sized"),
      "q_dim_vendedor" -> dimDict,
      "q_surrogate_key" -> dimDict,
      "q_fato_vendas" -> embedsDims,
      "q_fato_backfill" -> embedsDims,
      "q_fato_vendas_v2" -> embedsDims,
      "q_report_summary" -> embedsDims,
      // NOTE (r10): the co-purchase-artifact consumers (q_cooccur_lift,
      // q_degree_dist, q_item_neighbors, q_label_prop, q_link_predict,
      // q_pagerank_step, q_triangle_count) were triaged here through r9 as
      // "offsets window only" — the old string classifier misread their
      // PARTITIONED-but-unordered basket-size-cap window
      // (count(*) OVER (PARTITION BY l_orderkey)) as global. With
      // [[isGlobalWindowLine]] order-aware, those plans have NO global
      // window and need no exemption.
      "q_domain_gini" -> twoPass,
      "q_interleave" -> twoPass,
      "q_negative_sampling" -> twoPass,
      "q_pack" -> twoPass,
      "q_pack_bpe" -> twoPass, // same packFromCounts prefix-sum machinery
      "q_surrogate_scalable" -> twoPass,
      "q_vocab_coverage" -> twoPass,
      "q_column_profile" ->
        ("final ordering/rate pass over one row per PROFILED COLUMN " +
          "(table-width-bounded), the post-aggregate profile table"),
      "q_hist_quantile" -> bins,
      "q_winsorize" -> bins,
      "q_skyline" ->
        ("frontier scan over the DISTINCT (price, quantity) grid — a " +
          "post-aggregate table bounded by the value-grid cardinality"),
      "q_window_ntile" ->
        ("ntile demo over the 4-row per-segment aggregate — " +
          "post-aggregate, dictionary-bounded"))
  }
}
