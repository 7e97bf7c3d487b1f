package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Iterative graph ops: integer-exact PageRank and degree-oriented
  * triangle counting.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("r")).toMap

  test("pageRank: a 2-cycle is an exact fixed point of the integer step") {
    // r = 0.15·scale + 0.85·(scale div 1) = scale, every iteration —
    // the integer recurrence must preserve it bit-exactly.
    val out = ranks(Graph.pageRank(
      edges(1L -> 2L, 2L -> 1L), iters = 7, scale = 1000000000L))
    assert(out == Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("pageRank: hand-computed two iterations on an asymmetric triangle") {
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1; scale 1000, base = 150.
    // iter1: deg(1)=2, deg(2)=1, deg(3)=1
    //   in(1) = r3 div 1 = 1000        -> r1 = 150 + 850  = 1000
    //   in(2) = r1 div 2 = 500         -> r2 = 150 + (85*500) div 100 = 575
    //   in(3) = 500 + 1000 = 1500      -> r3 = 150 + (85*1500) div 100 = 1425
    // iter2:
    //   in(1) = 1425                   -> r1 = 150 + (85*1425) div 100 = 1361
    //   in(2) = 1000 div 2 = 500       -> r2 = 575
    //   in(3) = 500 + 575 = 1075       -> r3 = 150 + (85*1075) div 100 = 1063
    val out = ranks(Graph.pageRank(
      edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L), iters = 2, scale = 1000L))
    assert(out == Map(1L -> 1361L, 2L -> 575L, 3L -> 1063L))
  }

  test("pageRank: the hub of a symmetric star outranks every leaf") {
    val star = (2L to 9L).flatMap(l => Seq(1L -> l, l -> 1L))
    val out = ranks(Graph.pageRank(edges(star: _*), iters = 6))
    assert((2L to 9L).forall(l => out(1L) > out(l)))
    assert((2L to 9L).map(out).distinct.size == 1, "leaves are symmetric")
  }

  private def tris(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("triangles")).toMap

  test("personalizedPageRank: seeding every node degenerates to pageRank " +
      "bit-for-bit") {
    val e = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 2L)
    val all = Seq(1L, 2L, 3L, 4L).toDF("node")
    assert(ranks(Graph.personalizedPageRank(e, all, iters = 4, scale = 1000L))
      == ranks(Graph.pageRank(e, iters = 4, scale = 1000L)),
      "seeds = V must reproduce the uniform-teleport recurrence exactly")
  }

  test("personalizedPageRank: mass flows only FROM seeds; unreachable " +
      "nodes hold exactly 0 and trust dilutes per hop") {
    // chain 1 -> 2 -> 3 with a disconnected pair 8 <-> 9; seed = {1}.
    // scale 1000, base 150: r(1) = 150 + 0 (no in-edges), r(2) inherits
    // floor(85% of r(1)), r(3) floor(85% of r(2)) — strictly decaying;
    // 8 and 9 are never reached and must be EXACTLY 0, not epsilon.
    val e = edges(1L -> 2L, 2L -> 3L, 8L -> 9L, 9L -> 8L)
    val out = ranks(Graph.personalizedPageRank(
      e, Seq(1L).toDF("node"), iters = 6, scale = 1000L))
    assert(out(8L) == 0L && out(9L) == 0L,
      s"nodes unreachable from the seed set hold rank 0 exactly: $out")
    assert(out(1L) > out(2L) && out(2L) > out(3L) && out(3L) > 0L,
      s"trust must dilute monotonically with seed distance: $out")
    // hand-check the fixed point: r1 = 150; r2 = (85*150) div 100 = 127;
    // r3 = (85*127) div 100 = 107 (reached from iteration 3 on)
    assert(out(1L) == 150L && out(2L) == 127L && out(3L) == 107L,
      s"integer recurrence must match the hand computation: $out")
  }

  test("triangleCounts: K4 puts every node on exactly 3 triangles") {
    val k4 = for {
      u <- 1L to 4L; v <- 1L to 4L if u < v
    } yield u -> v
    assert(tris(Graph.triangleCounts(edges(k4: _*))) ==
      (1L to 4L).map(_ -> 3L).toMap)
  }

  test("triangleCounts: duplicates, reversed edges and self-loops are canonicalized") {
    val messy = edges(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L,
      1L -> 3L, 2L -> 2L)
    assert(tris(Graph.triangleCounts(messy)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: a star has none; adding one rim edge makes one") {
    val star = (2L to 30L).map(1L -> _)
    assert(tris(Graph.triangleCounts(edges(star: _*))).isEmpty)
    assert(tris(Graph.triangleCounts(edges(star :+ (2L -> 3L): _*))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
