package graft

import graft.queries.Cdc
import org.apache.spark.sql.functions._

/** q_graph_triangles vs an independent brute-force count of the SAME
  * capped graph: the spec collects the (small, degree-bounded) edge
  * artifact, enumerates triangles driver-side by set intersection,
  * and demands per-node equality — so the distributed wedge+closure
  * joins can't over- or under-count without this naming the node. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("distributed count equals brute force per node, and mass is 3 per triangle") {
    val d = sf("sf0.001")
    val edges = Cdc.supplierTopKEdges(spark, d, 5)
      .as[(Long, Long)].collect().toSet
    assert(edges.nonEmpty && edges.forall { case (x, y) => x < y })
    val adj = edges.toSeq.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupMap(_._1)(_._2).map { case (n, ps) => n -> ps.toSet }
    val triangles = for {
      (x, y) <- edges.toSeq
      z <- (adj(x) intersect adj(y)).toSeq if z > y
    } yield (x, y, z)
    val expected = triangles.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val got = Registry.byName("q_graph_triangles").run(spark, d)
      .as[(Long, Long)].collect().toMap
    assert(got === expected, "per-node triangle participation must match")
    assert(got.values.sum === 3L * triangles.size)
    assert(triangles.nonEmpty, "fixture must actually contain triangles")
  }
}
