package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when the semantics are
  * SQL-expressible deterministically) an equivalent DuckDB oracle SQL used
  * by the driver's correctness gate.
  *
  * Oracle parity rules (SURVEY.md §7.5):
  *  - total ORDER BY on every query (deterministic row order),
  *  - identical column aliases on both sides,
  *  - no order-dependent float reductions: money/doubles are scaled to
  *    exact integers (see [[graft.ops.ColumnOps.cents]]) before summing;
  *    any remaining double math is a fixed chain of IEEE ops on identical
  *    inputs (bit-identical across engines),
  *  - timestamps leave the query as formatted strings.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {
  lazy val all: Seq[Q] =
    queries.RefCoreQ.all ++
      queries.RelationalQ.all ++
      queries.FunctionsQ.all ++
      queries.DedupQ.all ++
      queries.SimilarityQ.all ++
      queries.TextQ.all ++
      queries.StreamingBatchQ.all ++
      queries.StreamingReplayQ.all ++
      queries.MultimodalQ.all ++
      queries.ScanQ.all ++
      queries.AdvancedQ.all ++
      queries.SampleQ.all ++
      queries.CompositeQ.all ++
      queries.PipelineQ.all ++
      queries.SketchQ.all ++
      queries.SubqueryQ.all ++
      queries.StatsQ.all ++
      queries.FunctionsExtQ.all ++
      queries.SinkQ.all ++
      queries.GraphQ.all ++
      queries.QualityQ.all ++
      queries.PatternQ.all ++
      queries.IterativeQ.all ++
      queries.BreadthQ.all ++
      queries.TrainPrepQ.all ++
      queries.TypedQ.all ++
      queries.CorpusQ.all ++
      queries.JoinExtQ.all ++
      queries.CompositeExtQ.all ++
      queries.LayoutQ.all ++
      queries.CompositeFullQ.all ++
      queries.Spark4Q.all ++
      queries.SqlSurfaceQ.all ++
      queries.AnalyticsExtQ.all ++
      queries.GeoQ.all ++
      queries.MlPrepQ.all ++
      queries.TemporalQ.all ++
      queries.DecimalQ.all ++
      queries.StateReadQ.all

  lazy val byName: Map[String, Q] = {
    // A duplicate key would silently shadow the earlier query in the Map
    // (exactly the round-6 f_variant bug) — fail fast instead.
    val dups = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dups.isEmpty, s"duplicate query keys in Registry: ${dups.mkString(", ")}")
    all.map(q => q.name -> q).toMap
  }
}
