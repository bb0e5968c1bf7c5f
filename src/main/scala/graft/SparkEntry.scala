package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — one `queries` entry per operator from SURVEY.md §2
  * (the reference's operator inventory), each re-expressed as an idiomatic
  * Spark pipeline over the driver's parquet tables (TESTDATA.md), with an
  * equivalent DuckDB `oracleSql` for the hash-compare correctness gate.
  *
  * The `events` table plays the role of the store's message log
  * (stream id ≅ user_id, global position ≅ event_id), so each read-path
  * operator of the store (SURVEY §2.1-2.5) has a faithful relational
  * counterpart that DuckDB can check.
  *
  * Determinism rules used throughout (the driver hash-compares values):
  * - every query ends in a total ORDER BY on unique keys;
  * - double aggregates go through exact DECIMAL sums and only then cast
  *   to double, so Spark's partial-aggregation order can't flip low bits
  *   vs DuckDB;
  * - aggregate/computed columns are aliased identically on both sides.
  */
object SparkEntry extends StoreGates with AnalyticsGates with PipelineGates with StreamingGates with TrainingGates with WarehouseGates with CdcGates with CorpusGates {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary over lineitem. */
  def entry(spark: SparkSession): DataFrame =
    q1PricingSummary(spark, "/root/testdata/sf0.001")

  // ==================================================================
  // Registry — composed from the per-family gate traits (keys are
  // disjoint by construction: each gate name lives in exactly one
  // family file). The composed maps are byte-identical to the former
  // single-file literals.
  // ==================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    storeGateQueries ++
    analyticsGateQueries ++
    pipelineGateQueries ++
    streamingGateQueries ++
    trainingGateQueries ++
    warehouseGateQueries ++
    cdcGateQueries ++
    corpusGateQueries

  def oracleSql: Map[String, String] =
    storeGateOracles ++
    analyticsGateOracles ++
    pipelineGateOracles ++
    streamingGateOracles ++
    trainingGateOracles ++
    warehouseGateOracles ++
    cdcGateOracles ++
    corpusGateOracles
}
