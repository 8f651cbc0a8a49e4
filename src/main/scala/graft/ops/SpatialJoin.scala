package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spatial joins (reference: presto-main/.../operator/
  * SpatialJoinOperator.java + SpatialIndexBuilderOperator.java build a
  * broadcast R-tree per worker, planned by iterative/rule/
  * ExtractSpatialJoins.java). A broadcast index caps the build side by
  * worker memory; the Spark-first equivalent is a PARTITIONED grid join —
  * both sides key their rows to grid cells and meet in a plain shuffled
  * equi-join, so neither side must fit anywhere, and the exact predicate
  * refines each candidate pair after the join (filter-after-join, the
  * standard filter-and-refine contract).
  *
  * Grid fan-out discipline at 100 TB:
  *   - distance join: the LEFT side expands to its 3×3 neighbor cells
  *     (bounded ×9); the RIGHT side stays at ×1 (its home cell), so a
  *     candidate pair meets in EXACTLY one cell and needs no post-join
  *     dedup (dedup would be another shuffle).
  *   - containment join: each polygon expands to the cells covering its
  *     envelope (bounded by `maxCellsPerPolygon` — fail loud rather than
  *     silently fan a continent-sized polygon across the cluster); points
  *     stay at ×1.
  * Cell keys are a single BIGINT (two packed 32-bit signed cell indexes)
  * so the shuffle hashes one fixed-width column. All cell arithmetic is
  * built-in codegen'd expressions; only the final refine evaluates the
  * geometry predicate, and for the distance join even the refine is plain
  * arithmetic.
  */
object SpatialJoin {

  /** floor(v / cell) as INT, packed with the neighbor offset. */
  private def cellIdx(v: Column, cell: Double): Column =
    floor(v / lit(cell)).cast("int")

  private def packCell(cx: Column, cy: Column): Column =
    (cx.cast("bigint") * lit(1L << 32)) + (cy.cast("bigint") + lit(1L << 31))

  /** All pairs (left row, right row) whose Euclidean point distance is
    * ≤ `radius`. `leftX/leftY/rightX/rightY` name coordinate columns on
    * the input frames; output carries every column of both inputs plus
    * `dist`. The grid cell size IS the radius: a pair within `radius`
    * can differ by at most one cell index per axis, so left×9 ∧ right×1
    * covers every candidate exactly once. */
  def distanceWithin(
      left: DataFrame, leftX: String, leftY: String,
      right: DataFrame, rightX: String, rightY: String,
      radius: Double): DataFrame = {
    require(radius > 0 && !radius.isNaN && !radius.isInfinite,
      s"distance-join radius must be a positive finite number, got $radius")
    val offsets = array((for (i <- -1 to 1; j <- -1 to 1)
      yield struct(lit(i).as("dx"), lit(j).as("dy"))): _*)
    val l = left
      .withColumn("__cx", cellIdx(col(leftX), radius))
      .withColumn("__cy", cellIdx(col(leftY), radius))
      .withColumn("__off", explode(offsets))
      .withColumn("__cell",
        packCell(col("__cx") + col("__off.dx"), col("__cy") + col("__off.dy")))
      .drop("__cx", "__cy", "__off")
    val r = right
      .withColumn("__cell", packCell(cellIdx(col(rightX), radius), cellIdx(col(rightY), radius)))
    l.join(r, "__cell")
      .withColumn("dist",
        hypot(col(leftX) - col(rightX), col(leftY) - col(rightY)))
      .filter(col("dist") <= lit(radius))
      .drop("__cell")
  }

  /** All (polygon row, point row) pairs where the polygon ST_Contains the
    * point. `polyWkt` names a WKT polygon column; the envelope drives the
    * cell covering (computed once per polygon row), and the exact
    * ray-cast contains refines after the equi-join. */
  def containsJoin(
      polygons: DataFrame, polyWkt: String,
      points: DataFrame, pointX: String, pointY: String,
      cellSize: Double, maxCellsPerPolygon: Int = 4096): DataFrame = {
    require(cellSize > 0 && !cellSize.isNaN && !cellSize.isInfinite,
      s"containment-join cell size must be a positive finite number, got $cellSize")
    val cells = udf { (wkt: String) =>
      if (wkt == null) null.asInstanceOf[Seq[Long]]
      else {
        import graft.functions.GeoFunctions
        GeoFunctions.envelope(GeoFunctions.parse(wkt)) match {
          case None => Seq.empty[Long]
          case Some((x0, y0, x1, y1)) =>
            val cx0 = Math.floor(x0 / cellSize).toInt
            val cx1 = Math.floor(x1 / cellSize).toInt
            val cy0 = Math.floor(y0 / cellSize).toInt
            val cy1 = Math.floor(y1 / cellSize).toInt
            val n = (cx1 - cx0 + 1).toLong * (cy1 - cy0 + 1).toLong
            require(n <= maxCellsPerPolygon,
              s"polygon envelope covers $n grid cells (> $maxCellsPerPolygon); raise cellSize or maxCellsPerPolygon")
            (for { cx <- cx0 to cx1; cy <- cy0 to cy1 }
              yield (cx.toLong << 32) + (cy.toLong + (1L << 31))): Seq[Long]
        }
      }
    }
    val stContains = udf { (wkt: String, x: Double, y: Double) =>
      import graft.functions.GeoFunctions
      GeoFunctions.contains(GeoFunctions.parse(wkt),
        GeoFunctions.GPoint(Some(GeoFunctions.Pt(x, y)))).exists(identity)
    }
    val p = polygons.withColumn("__cell", explode(cells(col(polyWkt))))
    val q = points.withColumn("__cell",
      packCell(cellIdx(col(pointX), cellSize), cellIdx(col(pointY), cellSize)))
    p.join(q, "__cell")
      .filter(stContains(col(polyWkt), col(pointX), col(pointY)))
      .drop("__cell")
  }
}
