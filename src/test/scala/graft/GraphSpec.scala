package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {

  /** Star basket graph: order 1 = {10, 11}, order 2 = {10, 12} →
    * part 10 is the hub (degree 2), 11/12 symmetric leaves. */
  private lazy val starDir: String = {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-graph").toString
    Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("l_orderkey", "l_partkey")
      .select($"l_orderkey", $"l_partkey", lit(1L).as("l_suppkey"),
        lit(1).as("l_linenumber"), lit(1.0).as("l_quantity"),
        lit(1.0).as("l_extendedprice"), lit(0.0).as("l_discount"),
        lit(0.0).as("l_tax"), lit("N").as("l_returnflag"),
        lit("O").as("l_linestatus"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("l_shipdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("pagerank conserves mass and ranks the hub above symmetric leaves") {
    val r = Graph.graphPagerank(spark, starDir).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 3)
    // symmetric graph, no dangling vertices: total mass stays 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r.toString)
    assert(r(11L) == r(12L), "symmetric leaves must tie exactly")
    assert(r(10L) > r(11L), "hub collects both leaves' mass")
  }

  /** Hub basket corpus: part 500 co-bought (support 2) with leaves
    * 1..40 and 1001..1040; leaves 1 and 1001 also co-bought together,
    * so exactly one triangle (1, 500, 1001) exists. Under id
    * orientation the hub's mid-range id gives in·out = 40·40 = 1600
    * wedges on one join key; degree orientation collapses that to 1. */
  private lazy val hubDir: String = {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-hub").toString
    val lows  = (1L to 40L).flatMap(l => Seq.tabulate(3)(r => (l * 10 + r, 500L, l)))
    val highs = (1L to 40L).flatMap(l => Seq.tabulate(3)(r => (l * 10 + 1000 + r, 500L, l + 1000L)))
    val tri   = Seq.tabulate(3)(r => (90000L + r, 1L, 1001L))
    (lows ++ highs ++ tri).flatMap { case (o, p1, p2) => Seq((o, p1), (o, p2)) }
      .toDF("l_orderkey", "l_partkey")
      .select($"l_orderkey", $"l_partkey", lit(1L).as("l_suppkey"),
        lit(1).as("l_linenumber"), lit(1.0).as("l_quantity"),
        lit(1.0).as("l_extendedprice"), lit(0.0).as("l_discount"),
        lit(0.0).as("l_tax"), lit("N").as("l_returnflag"),
        lit("O").as("l_linestatus"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("l_shipdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("triangles are exact on the hub graph and degree orientation kills the hub wedge blowup") {
    val s = spark; import s.implicits._
    val tris = Graph.graphTriangles(s, hubDir).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tris.toSeq == Seq((1L, 500L, 1001L)), s"expected the single planted triangle, got ${tris.toSeq}")

    val e0 = Graph.strongEdges(s, hubDir).cache()
    val m = e0.count() // 81 edges: 80 hub spokes + the (1, 1001) closer
    // id-oriented wedge count: the shape round 3 shipped — hub-quadratic
    val idWedges = e0.as("e1").join(e0.as("e2"), $"e1.v" === $"e2.u").count()
    // degree-oriented wedge count: what graphTriangles now does
    val or = Graph.orientEdges(s, e0)
    val degWedges = or.select($"s", $"t".as("t1"), $"dt".as("d1"))
      .join(or.select($"s", $"t".as("t2"), $"dt".as("d2")), "s")
      .filter($"d1" < $"d2" || ($"d1" === $"d2" && $"t1" < $"t2")).count()
    assert(idWedges >= 1000L, s"hub graph must exhibit the id-orientation blowup, got $idWedges")
    assert(degWedges <= 2L, s"degree orientation must collapse the hub wedges, got $degWedges")
    // the structural guarantee that bounds every join key at any scale
    val maxOut = or.groupBy($"s").count().agg(max("count")).head().getLong(0)
    assert(maxOut <= math.ceil(math.sqrt(2.0 * m)).toLong,
      s"out-degree $maxOut exceeds the sqrt(2m) degree-orientation bound")
    e0.unpersist()
  }

  test("neighbor similarity drops the hub and scores a shared-neighborhood pair exactly") {
    val s = spark; import s.implicits._
    // hubDir's part 500 is adjacent to 80 low/high parts — over the
    // 64 cap, so every wedge centered there must vanish; parts 1 and
    // 1001 (the planted triangle's non-hub corners, degree ≤ cap)
    // share exactly the capped common neighborhood
    val rows = Graph.graphNeighborSim(s, hubDir).collect()
    val asMap = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // no pair may owe its common count to the hub center: part 500 has
    // degree 81 > 64, so it is excluded from the capped graph entirely
    assert(!rows.exists(r => r.getLong(0) == 500L || r.getLong(1) == 500L),
      s"hub must be dropped: ${rows.mkString(";")}")
    // in the capped graph the (1, 1001) edge survives (both degree 2
    // there: each keeps its low/high partner + the closing edge);
    // their only common neighbor candidates are capped vertices
    asMap.get((1L, 1001L)).foreach { case (common, da, db, sim) =>
      val expect = common.toDouble / (da + db - common).toDouble
      assert(math.abs(sim - expect) < 1e-6, s"sim must be exact Jaccard: $sim vs $expect")
    }
    // every returned score is a valid Jaccard in (0, 1]
    rows.foreach { r =>
      val (c, da, db, sim) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(c >= 1 && sim > 0.0 && sim <= 1.0 && c <= math.min(da, db), r.toString)
    }
  }

  test("basket rules on the hub corpus match a brute-force reference") {
    val s = spark
    // brute force over the raw (order, part) pairs, straight from the
    // definition: support = n_ab/baskets, conf = n_ab/n_a, lift =
    // conf / (n_c/baskets); report pairs with n_ab >= threshold
    val rows = s.read.parquet(s"$hubDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val baskets = byOrder.size.toDouble
    val nP = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nAB = byOrder.values.toSeq
      .flatMap(ps => for (a <- ps; b <- ps if a != b) yield (a, b))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = nAB.collect { case ((a, c), n) if n >= Graph.basketMinPairs =>
      val conf = n.toDouble / nP(a)
      ((a, c), (n, rnd6(n / baskets), rnd6(conf), rnd6(conf / (nP(c) / baskets))))
    }.toMap
    val got = Graph.graphBasketRules(s, hubDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // the operator tops-N by lift; every returned rule must match the
    // brute-force numbers exactly, and if fewer than topN rules exist
    // the sets must be identical
    assert(got.nonEmpty, "hub corpus must produce rules")
    got.foreach { case (k, v) =>
      assert(expected.get(k).contains(v), s"rule $k: got $v want ${expected.get(k)}")
    }
    if (expected.size <= Graph.basketTopN)
      assert(got.keySet == expected.keySet,
        s"missing rules: ${expected.keySet -- got.keySet}")
  }

  test("label propagation splits a bridged barbell where components merge it") {
    val s = spark; import s.implicits._
    // Two 4-cliques {1..4} and {11..14} joined by one strong bridge
    // edge (4,11): reachability (graph_components) sees ONE component;
    // LPA must keep the dense sides in different communities — the
    // semantic difference the operator exists for. Every intra-clique
    // pair and the bridge pair co-occur in 2 orders (support ≥ 2).
    val dir = java.nio.file.Files.createTempDirectory("graft-lpa").toString
    val orders =
      Seq(1L, 2L).map(o => o -> Seq(1L, 2L, 3L, 4L)) ++
      Seq(3L, 4L).map(o => o -> Seq(11L, 12L, 13L, 14L)) ++
      Seq(5L, 6L).map(o => o -> Seq(4L, 11L))
    orders.flatMap { case (o, parts) => parts.map(p => (o, p)) }
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (Seq(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L) :+ 99L).toDF("p_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    val lpa = graft.operators.Graph.graphLabelProp(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val comA = Set(1L, 2L, 3L).map(p => lpa(p)._1)
    val comB = Set(12L, 13L, 14L).map(p => lpa(p)._1)
    assert(comA.size == 1, s"clique A must agree on one label: $lpa")
    assert(comB.size == 1, s"clique B must agree on one label: $lpa")
    assert(comA != comB, s"bridge must NOT merge the dense sides: $lpa")
    assert(lpa(99L) == ((99L, 1L)), "edge-free part stays a singleton community")
    val comp = graft.operators.Graph.graphComponents(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == comp(14L), "reachability must merge the barbell")
  }

  test("kcore peeling strips a tendril chain and keeps the triangle") {
    val s = spark; import s.implicits._
    // triangle {1,2,3} + tendril 3-4-5-6: every chain vertex has
    // degree ≤ 2 but the chain END has degree 1, so the peel strips
    // the chain inward round by round while the triangle (all degrees
    // 2 within the surviving set) is a fixed point.
    val dir = java.nio.file.Files.createTempDirectory("graft-kcore").toString
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq(2L * i + 100, 2L * i + 101).flatMap(o => Seq((o, u), (o, v)))
    }.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (1L to 6L).toDF("p_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    val core = graft.operators.Graph.graphKcore(s, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    Seq(1L, 2L, 3L).foreach(p =>
      assert(core(p) == ((true, 2L)), s"triangle vertex $p must stay in core: $core"))
    Seq(4L, 5L, 6L).foreach(p =>
      assert(core(p) == ((false, 0L)), s"tendril vertex $p must peel away: $core"))
  }

  test("pagerank is partition-invariant") {
    val s = spark
    val a = Graph.graphPagerank(s, sfDir).collect().map(_.toSeq).toSeq
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Graph.graphPagerank(s, sfDir).collect().map(_.toSeq).toSeq
      assert(a == b, "ranks must be bit-identical under any partitioning")
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("modularity internals reconcile: degrees sum to 2m, internal edges bounded, Q in range") {
    val s = spark
    val rows = Graph.graphModularity(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val m = Graph.strongEdges(s, sfDir).count()
    assert(rows.map(_._4).sum == 2 * m, "community degree sums must cover every edge end")
    assert(rows.map(_._3).sum <= m, "internal edges cannot exceed the edge count")
    rows.foreach { case (c, n, eIn, dSum, _) =>
      assert(eIn <= dSum / 2, s"community $c: $eIn internal edges need $dSum/2 degree")
      assert(n >= 1)
    }
    val q = rows.map(_._5).sum
    assert(q >= -0.5 && q <= 1.0, s"Q out of range: $q")
  }

  test("random walks move along real edges, run full length, and are partition-invariant") {
    val s = spark; import s.implicits._
    val walks = Graph.graphRandomWalk(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edgeSet = Graph.strongEdges(s, sfDir).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    val byStart = walks.groupBy(_._1)
    assert(byStart.nonEmpty)
    byStart.foreach { case (start, rows) =>
      val path = rows.sortBy(_._2).map(_._3)
      assert(rows.map(_._2).sorted.toSeq == (0L to Graph.walkSteps).toSeq,
        s"walk from $start has gaps: ${rows.map(_._2).sorted.mkString(",")}")
      assert(path.head == start)
      path.sliding(2).foreach { case Array(a, b) =>
        assert(edgeSet.contains((a, b)), s"walk from $start teleported: $a -> $b")
      }
    }
    // deterministic under any partitioning (the PRF is row-local and
    // the argmin a commutative aggregate)
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "7")
      val again = Graph.graphRandomWalk(s, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(walks.toSeq == again.toSeq, "walks must be partition-invariant")
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("bfs depths satisfy the BFS invariants: seed count, edge tension <= 1, horizon completeness") {
    val s = spark; import s.implicits._
    val depth = Graph.graphBfs(s, sfDir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(depth.values.count(_ == 0L) == Graph.bfsSeeds,
      s"exactly ${Graph.bfsSeeds} seeds at depth 0")
    assert(depth.values.max <= Graph.bfsRounds, "no depth beyond the horizon")
    val edges = Graph.strongEdges(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (u, v) =>
      val (du, dv) = (depth(u), depth(v))
      // optimality: adjacent reached nodes differ by at most one hop
      if (du >= 0 && dv >= 0)
        assert(math.abs(du - dv) <= 1, s"edge ($u,$v) tension: $du vs $dv")
      // completeness: a neighbor of a node strictly inside the
      // horizon cannot be unreached
      if (du >= 0 && du < Graph.bfsRounds)
        assert(dv >= 0, s"($v) unreached next to depth-$du ($u)")
      if (dv >= 0 && dv < Graph.bfsRounds)
        assert(du >= 0, s"($u) unreached next to depth-$dv ($v)")
    }
  }

  test("assortativity: a crafted star graph is maximally disassortative") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-assort").toString
    // hub part 0 co-purchased with each leaf 1..5 in two orders (so
    // every edge clears triangleMinSupport); the co-purchase graph is
    // a 5-leaf star — every edge joins the deg-5 hub to a deg-1 leaf,
    // the textbook r = -1 case
    val rows = for {
      leaf <- 1L to 5L
      rep <- 0 until 2
      part <- Seq(0L, leaf)
    } yield (leaf * 10L + rep, part)
    rows.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Graph.graphAssortativity(s, dir).collect()(0)
    assert(r.getLong(0) == 10L, s"star must have 2x5 directed edges: $r")
    assert(math.abs(r.getDouble(1) - -1.0) < 1e-9, s"star r must be -1: $r")
    // and on the real corpus r stays a valid correlation
    val real = Graph.graphAssortativity(s, sfDir).collect()(0)
    assert(!real.isNullAt(1) &&
      math.abs(real.getDouble(1)) <= 1.0, real.toString)
  }

  test("harmonic centrality: bounded terms, zero iff unreached, hubs dominate") {
    val s = spark
    val rows = Graph.graphHarmonic(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val parts = graft.sources.Tables.part(s, sfDir).count()
    assert(rows.length == parts)
    rows.foreach { case (id, nr, hm) =>
      assert(nr >= 0 && nr <= Graph.harmonicSources, s"$id n_reached $nr")
      // each reached source contributes at most 1/1 = 1e6 micro-units
      assert(hm <= nr * 1000000L, s"$id harmonic $hm for $nr sources")
      assert((nr == 0L) == (hm == 0L), s"$id inconsistent ($nr, $hm)")
    }
    val reached = rows.filter(_._2 > 0)
    assert(reached.nonEmpty, "no node reached any source")
    // nodes adjacent to every source (full depth-1 coverage) must
    // outrank any node that misses a source — holds whenever some
    // node reaches all k at distance 1
    val full = rows.filter(_._3 == Graph.harmonicSources * 1000000L)
    val partial = rows.filter(_._2 < Graph.harmonicSources).map(_._3)
    if (full.nonEmpty && partial.nonEmpty)
      assert(full.map(_._3).max > partial.max)
  }
  test("degree stats: hub graph buckets and hill alpha match hand computation; flat tail reads NULL") {
    // hubDir degrees: hub 500 has 80 distinct neighbors; leaves 1 and
    // 1001 have 2 (hub + each other); the other 78 leaves have 1.
    // n_tail = 3, ln-sum = ln(80/2) + ln(2/2) + ln(2/2) = ln(40),
    // alpha = 1 + 3/ln(40)
    val rows = Graph.graphDegreeStats(spark, hubDir).collect()
    val byDigits = rows.map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(byDigits(1) == ((80L, 1L, 2L, 0.987654)), byDigits.toString)
    assert(byDigits(2) == ((1L, 80L, 80L, 0.012346)), byDigits.toString)
    val alpha = rows.head.getDouble(6)
    assert(math.abs(alpha - (1.0 + 3.0 / math.log(40.0))) < 1e-4, s"alpha $alpha")
    assert(rows.forall(_.getLong(5) == 3L), "n_tail")
    // starDir: the only tail node sits AT d_min, so the ln-sum is 0
    // and alpha is undefined — must read NULL, not a crash or inf
    val star = Graph.graphDegreeStats(spark, starDir).collect()
    assert(star.forall(_.isNullAt(6)), star.mkString(";"))
    // shares always sum to 1
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
  }

  test("ppr: mass conserved, seeds positive, disconnected component excluded") {
    val s = spark; import s.implicits._
    // component A: hub 100 with leaves 1..8 (degree 8 vs 1); component
    // B: isolated pair 200-201. Top-5 seeds by (outdeg DESC, id) =
    // {100, 1, 2, 3, 4} — all in A, so B must receive ZERO rank.
    val dir = Files.createTempDirectory("graft-ppr").toString
    val a = (1L to 8L).map(l => (l, 100L, l))
    val b = Seq((50L, 200L, 201L))
    (a ++ b).flatMap { case (o, p1, p2) => Seq((o, p1), (o, p2)) }
      .toDF("l_orderkey", "l_partkey")
      .select($"l_orderkey", $"l_partkey", lit(1L).as("l_suppkey"),
        lit(1).as("l_linenumber"), lit(1.0).as("l_quantity"),
        lit(1.0).as("l_extendedprice"), lit(0.0).as("l_discount"),
        lit(0.0).as("l_tax"), lit("N").as("l_returnflag"),
        lit("O").as("l_linestatus"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("l_shipdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Graph.graphPpr(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // locality: the disconnected pair gets no rank at all
    assert(!r.contains(200L) && !r.contains(201L), r.toString)
    assert(r.keySet.subsetOf((1L to 8L).toSet + 100L), r.toString)
    // every seed keeps at least its restart share
    for (seed <- Seq(100L, 1L, 2L, 3L, 4L))
      assert(r(seed) > 0.0, s"seed $seed lost its restart mass: $r")
    // symmetric component, full restart vector sums to 1: total mass
    // stays 1 every round up to the 1e-12 contribution quantum
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass: ${r.values.sum}")
    // the hub receives mass from every seed leaf: it must dominate
    assert(r(100L) == r.values.max, r.toString)
    // non-seed leaves (5..8) are reached only through the hub —
    // positive but strictly below the seed leaves
    for (ns <- Seq(5L, 6L, 7L, 8L); sd <- Seq(1L, 2L, 3L, 4L))
      assert(r(ns) < r(sd), s"non-seed leaf $ns must trail seed leaf $sd: $r")
  }
}
