package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout — the multi-dimensional clustering
  * pass behind lakehouse `OPTIMIZE ZORDER BY` (Morton 1966; the Delta
  * Lake / Databricks layout optimization). Sorting 100 TB by ONE
  * column makes file-level min/max statistics prune that column only;
  * interleaving the bits of TWO dimensions onto one curve gives every
  * file a small bounding box in BOTH, so a predicate on either
  * dimension skips most files. The operator is the layout DECISION
  * plus its diligence report: assign each row a curve cell and a
  * target file, then report per-file bounding boxes and whether two
  * probe predicates (one per dimension) would have to read the file —
  * the exact skip/read decision parquet row-group pruning makes.
  *
  * Scale shape: dimension extents are a 1-row broadcast; cell, curve
  * value, and file id are scan-local integer projections (the curve is
  * 16 shift/mod terms, pure codegen); the report is ONE
  * partial-aggregable (layout, file) aggregate over a 2-way inline
  * explode (both layouts priced in one corpus pass). At production
  * scale the same `z` column feeds `repartitionByRange(z)` + sorted
  * write — the report here is the part a planner grades.
  */
object Layout {

  /** Per-dimension curve resolution (8 bits → 256 cells). */
  val ZCells = 256

  /** Target file count for the layout. */
  val ZFiles = 64

  /** Probe box: cells [lo, hi] on one dimension (a 1/16 slice). */
  val ProbeLo = 64
  val ProbeHi = 79

  /** Interleave the low 8 bits of two cell coordinates into a Morton
    * curve value — x gets the odd bit positions, y the even ones. */
  private def morton(cx: Column, cy: Column): Column =
    (0 until 8).map { i =>
      (shiftright(cx, i) % 2) * lit(1L << (2 * i + 1)) +
        (shiftright(cy, i) % 2) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** q103_zorder_layout — Z-order vs linear layout pruning report over
    * `orders` on (o_custkey, order date): per (layout, file): row
    * count, per-dimension cell bounding box, and whether a custkey
    * probe and a date probe would read the file. The linear layout
    * (range-partition by custkey alone) prunes the custkey probe
    * exactly as well but must read EVERY file for the date probe —
    * that contrast is the reason the curve exists. */
  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select(col("o_custkey"), col("o_orderdate"))
    val mm = o.agg(min(col("o_custkey")).as("ck_lo"), max(col("o_custkey")).as("ck_hi"),
      min(col("o_orderdate")).as("d_lo"), max(col("o_orderdate")).as("d_hi"))
    val cells = o.crossJoin(broadcast(mm))
      .select(
        expr(s"((o_custkey - ck_lo) * $ZCells) div (ck_hi - ck_lo + 1)")
          .cast("long").as("cx"),
        expr(s"(datediff(o_orderdate, d_lo) * $ZCells) div (datediff(d_hi, d_lo) + 1)")
          .cast("long").as("cy"))
      .select(col("cx"), col("cy"), morton(col("cx"), col("cy")).as("z"))
    cells
      .select(col("cx"), col("cy"), explode(array(
        struct(lit("zorder").as("layout"),
          expr(s"(z * $ZFiles) div ${ZCells.toLong * ZCells}").cast("long").as("file_id")),
        struct(lit("linear").as("layout"),
          expr(s"(cx * $ZFiles) div $ZCells").cast("long").as("file_id")))).as("a"))
      .select(col("a.layout").as("layout"), col("a.file_id").as("file_id"),
        col("cx"), col("cy"))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("cx")).as("min_cx"), max(col("cx")).as("max_cx"),
        min(col("cy")).as("min_cy"), max(col("cy")).as("max_cy"))
      .select(col("layout"), col("file_id"), col("n_rows"),
        col("min_cx"), col("max_cx"), col("min_cy"), col("max_cy"),
        (col("max_cx") >= ProbeLo && col("min_cx") <= ProbeHi).cast("int").as("hit_ck"),
        (col("max_cy") >= ProbeLo && col("min_cy") <= ProbeHi).cast("int").as("hit_date"))
      .orderBy("layout", "file_id")
  }
}
