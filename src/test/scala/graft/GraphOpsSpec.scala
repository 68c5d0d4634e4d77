package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Link-graph centrality (q132): hand-computable ranks on a tiny graph,
  * the integer-arithmetic invariants that make the oracle exact, and the
  * fixture's graph-shape contract.
  */
class GraphOpsSpec extends SparkSpec {

  test("pageRank: one iteration on a hand-computed 4-node graph") {
    import spark.implicits._
    // 0→1, 1→2, 2→0, 3→0; node 3 has no in-links
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val r = GraphOps.pageRank(edges, nodes, n = 4, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r0 = 250e6 each, base = 15e9/400 = 37.5e6, outdeg all 1
    assert(r(0L) === 37500000L + (85L * 500000000L) / 100) // from 2 and 3
    assert(r(1L) === 37500000L + (85L * 250000000L) / 100)
    assert(r(2L) === 37500000L + (85L * 250000000L) / 100)
    assert(r(3L) === 37500000L) // teleport base only
  }

  test("pageRank: deterministic under repartitioning, mass bounded") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val nodes = docs.select(col("doc_id"))
    val edges = GraphOps.linkFixture(nodes, n)
    val a = GraphOps.pageRank(edges, nodes, n, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRank(edges.repartition(7), nodes.repartition(3), n,
        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "integer ranks must not depend on partitioning")
    // total mass stays ≤ 1 (floors only lose nanos) and above the
    // all-teleport floor; ranks are not uniform
    val total = a.values.sum
    assert(total <= 1000000000L && total > 150000000L, s"mass $total")
    assert(a.values.toSet.size > 1, "floors + collapsed edges break symmetry")
  }

  test("hits: one iteration on a hand-computed 4-node graph") {
    import spark.implicits._
    // 0→2, 1→2, 2→3: node 2 is the authority (2 in-links), 0/1 the hubs
    val edges = Seq((0L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val r = GraphOps.hits(edges, nodes, iters = 1)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    // a′ = {2: 2e6, 3: 1e6}, amax = 2e6 → a = {2: 1e6, 3: 500000}
    assert(r(2L) === ((1000000L, 500000L))) // 2's hub score: only a(3)
    assert(r(3L) === ((500000L, 0L)))       // sink: authority, no hub
    // h′ = {0: 1e6, 1: 1e6, 2: 500000}, hmax = 1e6
    assert(r(0L) === ((0L, 1000000L)))
    assert(r(1L) === ((0L, 1000000L)))
  }

  test("hits: deterministic under repartitioning, scores in [0, 1e6]") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val nodes = docs.select(col("doc_id"))
    val edges = GraphOps.linkFixture(nodes, n)
    val a = GraphOps.hits(edges, nodes, n.toInt.min(3))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val b = GraphOps.hits(edges.repartition(7), nodes.repartition(3),
        n.toInt.min(3))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(a === b, "integer scores must not depend on partitioning")
    assert(a.values.forall { case (au, h) =>
      au >= 0 && au <= 1000000L && h >= 0 && h <= 1000000L })
    // L∞ normalization pins at least one node to exactly 1e6 on each side
    assert(a.values.exists(_._1 === 1000000L))
    assert(a.values.exists(_._2 === 1000000L))
  }

  test("kCore: cascading tail peel on a hand graph; fixture converges") {
    import spark.implicits._
    // triangle 0-1-2 with a tail 2-3-4: k=2 peels 4 (deg 1), then 3
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("doc_id")
    val out = GraphOps.kCore(edges, nodes, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out(0L) === ((2L, true)))
    assert(out(1L) === ((2L, true)))
    assert(out(2L) === ((2L, true)), "triangle survives at its own degree")
    assert(out(3L) === ((0L, false)), "peeled after its leaf went")
    assert(out(4L) === ((0L, false)))
    // q208 fixture: fixpoint well inside maxRounds (a higher cap changes
    // nothing), a NON-trivial core, and every member at degree >= k
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val nd = docs.select(col("doc_id"))
    val fx = GraphOps.tieredLinkFixture(nd, n)
    val a = GraphOps.kCore(fx, nd, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val b = GraphOps.kCore(fx, nd, k = 3, maxRounds = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(a === b, "fixpoint must land inside the default cap")
    val core = a.filter(_._3)
    assert(core.nonEmpty && core.length < a.length, "non-trivial peel")
    core.foreach { case (id, deg, _) =>
      assert(deg >= 3L, s"core member $id below k") }
  }

  test("linkFixture: in-range, no self-loops, collapsed multi-edges") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val edges = GraphOps.linkFixture(docs.select(col("doc_id")), n)
    assert(edges.filter(col("dst") === col("src")).count() === 0)
    assert(edges.filter(col("dst") < 0 || col("dst") >= n).count() === 0)
    assert(edges.count() === edges.distinct().count())
    // out-degree 2..3: three affine maps minus any self-loop collisions
    val od = edges.groupBy("src").count().agg(min("count"), max("count"))
      .collect().head
    assert(od.getLong(0) >= 2L && od.getLong(1) <= 3L, od.toString)
  }

  test("triangleCount: hand triangle+pendant, K4 closure, square zero, " +
      "each triangle owned once") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4 on node 1
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
      .toDF("src", "dst")
    val out = GraphOps.triangleCount(edges, nodes).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 3L && out(1L).getLong(2) === 1L)
    assert(out(1L).getDouble(3) === 0.333333, "cc = 2*1/(3*2) truncated")
    assert(out(2L).getDouble(3) === 1.0, "degree-2 closed pair")
    assert(out(4L).getLong(2) === 0L && out(4L).isNullAt(3),
      "pendant: no triangles, cc undefined below degree 2")
    // K4: 4 triangles total, 3 per node, cc 1 everywhere (the explode
    // sum = 3*count(tri) checks each triangle is enumerated ONCE)
    val k4n = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val k4e = (for (i <- 0 to 3; j <- 0 to 3 if i < j)
      yield (i.toLong, j.toLong)).toDF("src", "dst")
    val k4 = GraphOps.triangleCount(k4e, k4n).collect()
    k4.foreach { r =>
      assert(r.getLong(2) === 3L && r.getDouble(3) === 1.0, r.toString)
    }
    // 4-cycle: plenty of paths, zero closure
    val sqe = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    GraphOps.triangleCount(sqe, k4n).collect().foreach { r =>
      assert(r.getLong(2) === 0L && r.getDouble(3) === 0.0)
    }
  }

  test("triangleFixture: chords guarantee triangles at fixture scale") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val nodes = docs.select(col("doc_id"))
    val edges = GraphOps.triangleFixture(nodes, n)
    assert(edges.filter(col("dst") === col("src")).count() === 0)
    val tri = GraphOps.triangleCount(edges, nodes)
    val total = tri.agg(sum(col("triangles"))).collect().head.getLong(0)
    assert(total >= 3 * (n / 7 - 2),
      s"every chord closes a ring triangle, got vertex-sum $total")
  }

  test("assortativity: star reads exactly -1e6, regular ring NULL, " +
      "two cliques joined by a bridge read negative but above -1") {
    import spark.implicits._
    // K1,3: every edge joins degree 3 to degree 1 -> r = -1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val s = GraphOps.assortativity(star).collect().head
    assert(s.getAs[Long]("n_edges") === 3L)
    assert(s.getAs[Long]("n_nodes") === 4L)
    assert(s.getAs[Long]("assort6") === -1000000L)
    // 4-cycle: all degrees equal -> zero variance -> NULL
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("src", "dst")
    val r = GraphOps.assortativity(ring).collect().head
    assert(r.isNullAt(r.fieldIndex("assort6")))
    // two triangles + a bridge: bridge endpoints have degree 3, the
    // rest 2 -> mildly disassortative, strictly inside (-1e6, 0)
    val bridged = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L)).toDF("src", "dst")
    val b = GraphOps.assortativity(bridged).collect().head
    val a6 = b.getAs[Long]("assort6")
    assert(a6 < 0L && a6 > -1000000L, s"got $a6")
    // direction/duplication invariance: reversing and duplicating
    // edges must not move the coefficient (symmetrize + distinct)
    val noisy = bridged.union(bridged.select(col("dst").as("src"),
      col("src").as("dst"))).union(bridged)
    assert(GraphOps.assortativity(noisy).collect().head
      .getAs[Long]("assort6") === a6)
  }

  test("reciprocity: exact r and density-corrected rho, complete " +
      "digraph NULL rho, non-returning reads negative") {
    import spark.implicits._
    // one mutual pair + one one-way link on 3 nodes:
    // r = 2/3, rho = (2*6 - 9)/(3*(6-3)) = 1/3
    val mixed = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val m = GraphOps.reciprocity(mixed, nNodes = 3L).collect().head
    assert(m.getAs[Long]("n_edges") === 3L)
    assert(m.getAs[Long]("n_mutual") === 2L)
    assert(m.getAs[Long]("r6") === 666666L)
    assert(m.getAs[Long]("rho6") === 333333L)
    // complete digraph on 2 nodes: chance = certainty -> rho undefined
    val k2 = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val c = GraphOps.reciprocity(k2, nNodes = 2L).collect().head
    assert(c.getAs[Long]("r6") === 1000000L)
    assert(c.isNullAt(c.fieldIndex("rho6")))
    // zero mutual links on a sparse graph: below chance -> negative
    val oneway = Seq((1L, 2L), (3L, 1L)).toDF("src", "dst")
    val o = GraphOps.reciprocity(oneway, nNodes = 3L).collect().head
    assert(o.getAs[Long]("r6") === 0L)
    assert(o.getAs[Long]("rho6") === -500000L)
    // self-loops and duplicates are dropped before counting
    val dirty = mixed.union(mixed)
      .union(Seq((1L, 1L)).toDF("src", "dst"))
    assert(GraphOps.reciprocity(dirty, nNodes = 3L).collect().head
      .getAs[Long]("r6") === 666666L)
  }
}
