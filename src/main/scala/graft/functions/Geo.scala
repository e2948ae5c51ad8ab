package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Point-in-polygon tagging (utils.read_geojson / find_geographic_area,
  * utils.py:52-76; ObsFile.assign_geo_code, ObsFile.py:540-547).
  *
  * The polygon catalog is known at plan time (as with the reference's
  * geojson file read on startup), so the even-odd ray cast is *unrolled
  * per edge* into plain comparisons/arithmetic — whole-stage-codegen
  * friendly, no UDF, and the identical expression tree can be emitted as
  * SQL for the oracle. At 100 TB this is a map-only operator: zero
  * shuffle, scales linearly.
  */
object Geo {

  final case class NamedPolygon(name: String, vertices: Seq[(Double, Double)])

  /** Even-odd crossing count, unrolled: for each edge (xi,yi)-(xj,yj),
    * count it when ((yi>y) != (yj>y)) AND x < (xj-xi)·(y-yi)/(yj-yi)+xi.
    * Interior points only (boundary behavior undefined, as with
    * shapely's `contains` which the reference uses).
    */
  def pointInPolygon(x: Column, y: Column, poly: Seq[(Double, Double)]): Column = {
    val n = poly.length
    // Horizontal edges (yi == yj) can never cross a horizontal ray: the
    // term is a constant 0, so it is dropped at plan-build time (also
    // avoids Spark's "trivially true equals predicate" warning for the
    // structurally-identical (yi > y) =!= (yj > y) comparison).
    val terms = (0 until n).flatMap { i =>
      val (xi, yi) = poly(i)
      val (xj, yj) = poly((i + 1) % n)
      if (yi == yj) None
      else {
        val crosses = (lit(yi) > y) =!= (lit(yj) > y)
        val xAtY = (lit(xj) - xi) * (y - yi) / (yj - yi) + xi
        Some(when(crosses && x < xAtY, 1).otherwise(0))
      }
    }
    val crossings = terms.reduceOption(_ + _).getOrElse(lit(0))
    crossings % 2 === 1
  }

  /** SQL twin of [[pointInPolygon]] — same edge order, same arithmetic
    * shape, so doubles match bit-for-bit across engines.
    */
  def pointInPolygonSql(xExpr: String, yExpr: String, poly: Seq[(Double, Double)]): String = {
    val n = poly.length
    // Same horizontal-edge drop as the Column twin: those terms are
    // constant 0, so the sum (and the oracle comparison) is unchanged.
    val terms = (0 until n).flatMap { i =>
      val (xi, yi) = poly(i)
      val (xj, yj) = poly((i + 1) % n)
      if (yi == yj) None
      else Some(s"(CASE WHEN (($yi > $yExpr) != ($yj > $yExpr)) AND " +
        s"($xExpr < ($xj - $xi) * ($yExpr - $yi) / ($yj - $yi) + $xi) THEN 1 ELSE 0 END)")
    }
    if (terms.isEmpty) "(1 = 0)"
    else s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** Geographic-area tag: every containing polygon's name (spaces → '-'),
    * space-joined with a trailing space; 'None' when nothing contains the
    * point — exactly find_geographic_area (utils.py:70-76).
    */
  def geoArea(x: Column, y: Column, catalog: Seq[NamedPolygon]): Column = {
    val parts = catalog.map { p =>
      when(pointInPolygon(x, y, p.vertices), p.name.replace(' ', '-') + " ").otherwise("")
    }
    val joined = concat(parts: _*)
    when(joined === "", "None").otherwise(joined)
  }

  def geoAreaSql(xExpr: String, yExpr: String, catalog: Seq[NamedPolygon]): String = {
    val parts = catalog.map { p =>
      s"(CASE WHEN ${pointInPolygonSql(xExpr, yExpr, p.vertices)} " +
        s"THEN '${p.name.replace(' ', '-')} ' ELSE '' END)"
    }
    val joined = parts.mkString(" || ")
    s"(CASE WHEN ($joined) = '' THEN 'None' ELSE ($joined) END)"
  }

  /** Catalog-scale variant of [[geoArea]]: vertices travel as array
    * LITERALS and the ray cast is one `aggregate` lambda, so the
    * expression tree stays O(1) in catalog size — the unrolled form
    * blows analyzer recursion beyond a few dozen polygons, this one
    * handles thousands. Same arithmetic per edge, same output format.
    */
  def geoAreaLarge(x: Column, y: Column, catalog: Seq[NamedPolygon]): Column = {
    import org.apache.spark.sql.functions._
    val polys = array(catalog.map { p =>
      struct(
        lit(p.name.replace(' ', '-')).as("name"),
        array(p.vertices.map { case (vx, vy) =>
          struct(lit(vx).as("x"), lit(vy).as("y"))
        }: _*).as("verts"))
    }: _*)
    def inside(verts: Column): Column = {
      val n = size(verts)
      val crossings = aggregate(sequence(lit(0), n - 1), lit(0), (acc, i) => {
        val vi = element_at(verts, i + 1)
        val vj = element_at(verts, pmod(i + 1, n) + 1)
        val (xi, yi) = (vi.getField("x"), vi.getField("y"))
        val (xj, yj) = (vj.getField("x"), vj.getField("y"))
        val crosses = (yi > y) =!= (yj > y)
        val xAtY = (xj - xi) * (y - yi) / (yj - yi) + xi
        acc + when(crosses && x < xAtY, 1).otherwise(0)
      })
      // degenerate (< 3 vertex) rings never contain anything; the guard
      // also avoids sequence(0,-1) counting down on an empty array
      when(n >= 3, crossings % 2 === 1).otherwise(lit(false))
    }
    val joined = aggregate(polys, lit(""), (acc, p) =>
      concat(acc, when(inside(p.getField("verts")),
        concat(p.getField("name"), lit(" "))).otherwise("")))
    when(joined === "", "None").otherwise(joined)
  }

  /** Load a named-polygon catalog from a GeoJSON FeatureCollection — the
    * reference's utils.read_geojson (utils.py:52-67), done with Spark's
    * own JSON reader. The catalog is collected to the driver: it is
    * plan-time configuration (the reference also loads it once up
    * front), and [[geoArea]] unrolls it into the plan.
    */
  def catalogFromGeoJson(spark: org.apache.spark.sql.SparkSession, path: String): Seq[NamedPolygon] = {
    import org.apache.spark.sql.functions.{col, explode}
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("features")).as("f"))
      .filter(col("f.geometry.type") === "Polygon")
      .select(col("f.properties.name").as("name"),
        col("f.geometry.coordinates").getItem(0).as("ring"))
      .collect()
      .map { r =>
        val ring = r.getSeq[scala.collection.Seq[Double]](1)
          .map(p => (p(0), p(1)))
        NamedPolygon(r.getString(0), ring)
      }.toSeq
  }

  /** Test catalog standing in for the reference's ios_polygons.geojson:
    * overlapping shapes so multi-containment and the 'None' fallthrough
    * both occur.
    */
  val testCatalog: Seq[NamedPolygon] = Seq(
    NamedPolygon("north box", Seq((-140.0, 40.0), (-120.0, 40.0), (-120.0, 60.0), (-140.0, 60.0))),
    NamedPolygon("coastal strip", Seq((-130.0, 30.0), (-110.0, 30.0), (-110.0, 70.0), (-130.0, 70.0))),
    NamedPolygon("triangle zone", Seq((-60.0, -20.0), (-20.0, -20.0), (-40.0, 20.0))))
}
