package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Behavioral, Experimentation}

class BehavioralSpec extends SparkSpec {

  test("histogram of a single-valued column is one bin, not NaN") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hist").toString
    Seq.tabulate(7)(i => (i.toLong, 42.5))
      .toDF("o_orderkey", "o_totalprice")
      .select($"o_orderkey", lit(1L).as("o_custkey"), $"o_totalprice",
        lit("1995-01-01").cast("date").as("o_orderdate"),
        lit("O").as("o_orderstatus"), lit("MEDIUM").as("o_orderpriority"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.operators.Behavioral.qHistogram(s, dir).collect()
    assert(r.length == 1, r.mkString(";"))
    assert(r.head.getLong(0) == 0L && r.head.getLong(2) == 7L, r.head.toString)
    assert(!r.head.getDouble(1).isNaN, "bin_lo must be the value, not NaN")
  }

  test("q_cusum alarms on a sustained shift no single day would flag") {
    val s = spark; import s.implicits._
    // 30 days of "click": days 1-20 alternate 99/101 events (mean 100,
    // tiny σ from the later shift included); days 21-30 run at 103 —
    // a +3/day drift, far below any single-day outlier threshold,
    // that only the cumulative statistic catches.
    val dir = Files.createTempDirectory("graft-cusum").toString
    val dayUs = 86400L * 1000000L
    var id = 0L
    val rows = (1 to 30).flatMap { d =>
      val n = if (d <= 20) { if (d % 2 == 0) 99 else 101 } else 103
      (0 until n).map { i =>
        id += 1
        (id, d.toLong * dayUs + i * 1000000L, (i % 7).toLong, "click")
      }
    }
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select($"event_id", timestamp_micros($"us").as("ts"), $"user_id",
        $"event_type", lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Behavioral.qCusum(s, dir).collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.length == 30)
    // the first 20 baseline days never alarm
    assert(out.take(20).forall(!_._4), out.take(20).mkString(";"))
    // the shift is eventually flagged, and once flagged the cumulative
    // statistic keeps climbing through the sustained shift
    val flaggedIdx = out.indexWhere(_._4)
    assert(flaggedIdx >= 20, s"alarm before the shift: $flaggedIdx")
    assert(flaggedIdx < 30, "sustained +3/day shift never alarmed")
    val tail = out.drop(flaggedIdx).map(_._3)
    assert(tail.zip(tail.tail).forall { case (a, b) => b > a },
      s"cusum must climb through the sustained shift: ${tail.mkString(",")}")
  }

  test("q_markov transition rows are row-stochastic (probs sum to 1 per prev_type)") {
    val s = spark; import s.implicits._
    val sums = Behavioral.qMarkov(s, sfDir)
      .groupBy($"prev_type").agg(sum($"prob").as("p"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      // each prob is half-up quantized at 1e-6; a row of ≤|types| probs
      // can therefore drift at most |types|·5e-7 from exactly 1
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-5, r.toString)
    }
  }

  test("q_ewma first observed bucket per type equals its own bucket average") {
    val s = spark; import s.implicits._
    val r = Behavioral.qEwma(s, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"bucket_ts")
    val firsts = r.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).collect()
    assert(firsts.nonEmpty)
    firsts.foreach { row =>
      val x = row.getAs[Double]("x_avg"); val e = row.getAs[Double]("ewma")
      // only the 1e-6 intermediate quantization separates them
      assert(math.abs(x - e) < 1e-3, s"first-bucket ewma must equal x_avg: $row")
    }
  }

  test("q_abtest t statistic is antisymmetric under arm swap") {
    val s = spark; import s.implicits._
    // swapping the arm labels must negate t exactly (same moments,
    // roles exchanged) — catches any asymmetric n/variance wiring
    val base = Experimentation.qAbtest(s, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("t_stat")).toMap
    val ev = graft.sources.Tables.events(s, sfDir)
    val swapped = ev.withColumn("user_id", $"user_id" + 1L)
    val dir2 = Files.createTempDirectory("graft-abtest").toString
    // re-point the loader at a swapped-parity copy of the table
    swapped.coalesce(1).write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val sw = Experimentation.qAbtest(s, dir2).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("t_stat")).toMap
    base.keys.foreach { k =>
      assert(math.abs(base(k) + sw(k)) < 1e-5, s"$k: ${base(k)} vs ${sw(k)}")
    }
  }

  test("matchSteps rejects input frames carrying its working columns") {
    val s = spark; import s.implicits._
    val ev = graft.sources.Tables.events(s, sfDir)
      .withColumn("__key", org.apache.spark.sql.functions.lit(1))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sequences.matchSteps(ev, $"user_id", $"ts", $"event_id",
        Seq($"event_type" === "view"))
    }
    assert(e.getMessage.contains("__key"), e.getMessage)
  }

  /** Crafted event log hitting the funnel's ordering edges the random
    * corpus can't be trusted to exercise: out-of-order steps, equal
    * timestamps (strictly-after must exclude), and step skipping. */
  private lazy val funnelDir: String = {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-funnel").toString
    def t(us: Long) = us * 1000000L
    Seq(
      // user 1: clean view → click → purchase — reaches every step
      (1L, t(10), 1L, "view"), (2L, t(20), 1L, "click"), (3L, t(30), 1L, "purchase"),
      // user 2: click BEFORE the first view — click must not count,
      // and the purchase can't qualify without a qualified click
      (4L, t(20), 2L, "view"), (5L, t(10), 2L, "click"), (6L, t(30), 2L, "purchase"),
      // user 3: view → purchase, no click — purchase must not count
      (7L, t(10), 3L, "view"), (8L, t(20), 3L, "purchase"),
      // user 4: click at EXACTLY the view time — strictly-after excludes
      (9L, t(10), 4L, "view"), (10L, t(10), 4L, "click"),
      // user 5: purchase between view and click — the click itself
      // qualifies (after the view) but the purchase precedes it
      (11L, t(10), 5L, "view"), (12L, t(30), 5L, "click"), (13L, t(20), 5L, "purchase"))
      .toDF("event_id", "us", "user_id", "event_type")
      .select($"event_id", timestamp_micros($"us").as("ts"), $"user_id",
        $"event_type", lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel enforces strict step ordering") {
    val r = Behavioral.qFunnel(spark, funnelDir).collect()(0)
    assert(r.getLong(r.fieldIndex("users_total")) == 5L)
    assert(r.getLong(r.fieldIndex("users_view")) == 5L)
    assert(r.getLong(r.fieldIndex("users_click")) == 2L)    // users 1, 5
    assert(r.getLong(r.fieldIndex("users_purchase")) == 1L) // only user 1
  }

  test("funnel plans one exchange: windows and rollup share the user_id partitioning") {
    val p = Behavioral.qFunnel(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("retention cells cover every cohort at offset 0 with the full cohort") {
    val s = spark; import s.implicits._
    val ret = Behavioral.qRetention(s, sfDir).collect()
    assert(ret.forall(_.getLong(1) >= 0L), "no negative day offsets")
    // offset-0 cells: every user is active on their own first day, so
    // the sum over cohorts equals the distinct user count
    val atZero = ret.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = graft.sources.Tables.events(s, sfDir)
      .select($"user_id").distinct().count()
    assert(atZero == users, s"offset-0 sum $atZero != $users users")
  }

  test("resample emits the complete grid and forward-fills from the last observation") {
    val s = spark; import s.implicits._
    val out = Behavioral.qTimeResample(s, sfDir).collect()
    val types = out.map(_.getString(0)).distinct
    val buckets = out.map(_.getTimestamp(1)).distinct
    assert(out.length == types.length * buckets.length, "grid must be dense")
    // per type, walk buckets in order: ffill rows repeat the previous
    // value; 'none' only before the first observation; n_obs=0 ⇔ hole
    types.foreach { t =>
      var last: Option[Double] = None
      out.filter(_.getString(0) == t).sortBy(_.getTimestamp(1).getTime).foreach { r =>
        val avg = if (r.isNullAt(2)) None else Some(r.getDouble(2))
        val nObs = r.getLong(3); val src = r.getString(4)
        src match {
          case "obs"   => assert(nObs > 0); last = avg
          case "ffill" => assert(nObs == 0); assert(avg == last, s"$t $r")
          case "none"  => assert(nObs == 0 && avg.isEmpty && last.isEmpty)
        }
      }
    }
  }

  test("histogram bins partition the rows exactly") {
    val s = spark; import s.implicits._
    val h = Behavioral.qHistogram(s, sfDir).collect()
    assert(h.map(_.getLong(0)).toSeq == h.map(_.getLong(0)).toSeq.sorted)
    assert(h.map(_.getLong(2)).sum ==
      graft.sources.Tables.orders(s, sfDir).count())
  }

  test("mv refresh merge equals a full recompute") {
    val s = spark; import s.implicits._
    val merged = Behavioral.qMvRefresh(s, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val full = graft.sources.Tables.events(s, sfDir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"), graft.functions.Agg.dsum($"value").as("sv"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(merged == full)
  }

  test("sequence matcher with the funnel's steps reproduces the funnel counts") {
    val s = spark; import s.implicits._
    val ev = graft.sources.Tables.events(s, sfDir)
    val m = graft.operators.Sequences.matchSteps(ev, $"user_id", $"ts", $"event_id",
      Seq("view", "click", "purchase").map(t => $"event_type" === t)).collect()
    val b = Behavioral.qFunnel(s, sfDir).collect()(0)
    assert(m.length.toLong == b.getLong(b.fieldIndex("users_view")))
    assert(m.count(!_.isNullAt(2)).toLong == b.getLong(b.fieldIndex("users_click")))
    assert(m.count(!_.isNullAt(3)).toLong == b.getLong(b.fieldIndex("users_purchase")))
  }

  test("an N-step pattern still plans one hash exchange") {
    val s = spark; import s.implicits._
    val p = graft.operators.Sequences.qSequenceMatch(s, sfDir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("constraint audit fires on corrupted rows") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-constraints").toString
    def ts(d: String) = lit(d).cast("timestamp")
    // customers 1..3; orders: PK 10 duplicated, order 12 orphaned to
    // customer 99; lineitem: one orphan order 999, one discount 1.5,
    // one quantity 0
    Seq((1L, "c1"), (2L, "c2"), (3L, "c3"))
      .toDF("c_custkey", "c_name")
      .select($"c_custkey", $"c_name", lit(0).as("c_nationkey"),
        lit(1.0).as("c_acctbal"), lit("BUILDING").as("c_mktsegment"))
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (10L, 2L), (11L, 2L), (12L, 99L))
      .toDF("o_orderkey", "o_custkey")
      .select($"o_orderkey", $"o_custkey", lit("O").as("o_orderstatus"),
        lit(100.0).as("o_totalprice"), ts("2024-01-01 00:00:00").as("o_orderdate"),
        lit("1-URGENT").as("o_orderpriority"))
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq((10L, 1.0, 0.05), (11L, 2.0, 1.5), (999L, 0.0, 0.0))
      .toDF("l_orderkey", "l_quantity", "l_discount")
      .select($"l_orderkey", lit(1L).as("l_partkey"), lit(1L).as("l_suppkey"),
        lit(1).as("l_linenumber"), $"l_quantity", lit(10.0).as("l_extendedprice"),
        $"l_discount", lit(0.0).as("l_tax"), lit("N").as("l_returnflag"),
        lit("O").as("l_linestatus"), ts("2024-01-02 00:00:00").as("l_shipdate"))
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val v = graft.operators.Relational.qConstraints(s, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map(
      "pk_orders_unique" -> 1L,    // key 10 appears twice
      "fk_lineitem_orders" -> 1L,  // order 999
      "fk_orders_customer" -> 1L,  // customer 99
      "range_discount_0_1" -> 1L,  // 1.5
      "range_quantity_pos" -> 1L), v.toString) // 0.0
  }

  test("mv delta scan pushes the time predicate into the parquet scan") {
    Behavioral.buildDailyMv(spark, sfDir)
    val p = Behavioral.mvDeltaPlan(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(ts"), p)
  }

  /** Arrival order (event_id) deliberately disagrees with event time:
    * user 1's second arrival regresses 5 s behind the watermark. */
  private lazy val latenessDir: String = {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    def t(sec: Long) = sec * 1000000L
    Seq(
      // user 1: in-order, then a 5 s regressor, then in-order again
      (1L, t(100), 1L, "click"), (2L, t(95), 1L, "click"), (3L, t(110), 1L, "click"),
      // user 2: fully in-order
      (4L, t(10), 2L, "view"), (5L, t(20), 2L, "view"))
      .toDF("event_id", "us", "user_id", "event_type")
      .select($"event_id", timestamp_micros($"us").as("ts"), $"user_id",
        $"event_type", lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("holt trend locks onto a perfect linear ramp") {
    val s = spark; import s.implicits._
    // 40 days of exactly x_t = 100 + 2t: Holt's trend component must
    // converge to the true slope 2 and the one-step forecast error
    // must shrink to ~0 — the property that distinguishes it from
    // EWMA, which lags a ramp forever.
    val dir = Files.createTempDirectory("graft-holt").toString
    val dayUs = 86400L * 1000000L
    var id = 0L
    val rows = (1 to 40).flatMap { d =>
      (0 until (100 + 2 * d)).map { i =>
        id += 1
        (id, d.toLong * dayUs + i * 1000000L, (i % 7).toLong, "click")
      }
    }
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select($"event_id", timestamp_micros($"us").as("ts"), $"user_id",
        $"event_type", lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Behavioral.qHoltForecast(s, dir).collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) Double.NaN else r.getDouble(5)))
    assert(out.length == 40)
    assert(out.head._4.isNaN, "day 1 has no forecast")
    val lastTrend = out.last._3
    assert(math.abs(lastTrend - 2.0) < 0.05,
      s"trend must converge to the true slope 2: $lastTrend")
    val lastErr = math.abs(out.last._4 - out.last._1)
    assert(lastErr < 1.0, s"steady-state forecast error must be ~0: $lastErr")
  }

  test("segment overlap counts a crafted audience exactly") {
    val s = spark; import s.implicits._
    // users 1-10 do "a"; users 6-15 do "b"; user 1 also does "c".
    // Expected: (a,b) both=5 sizes 10/10 J=5/15; (a,c) both=1 J=1/10;
    // (b,c) absent (no shared user → no row).
    val dir = Files.createTempDirectory("graft-seg").toString
    var id = 0L
    val rows =
      (1 to 10).map { u => id += 1; (id, u.toLong, "a") } ++
      (6 to 15).map { u => id += 1; (id, u.toLong, "b") } ++
      Seq({ id += 1; (id, 1L, "c") })
    rows.toDF("event_id", "user_id", "event_type")
      .select($"event_id", timestamp_micros(lit(1000000L) * $"event_id").as("ts"),
        $"user_id", $"event_type", lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Behavioral.qSegmentOverlap(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got(("a", "b")) == ((5L, 10L, 10L, 0.333333)), got.toString)
    assert(got(("a", "c")) == ((1L, 10L, 1L, 0.1)), got.toString)
    assert(!got.contains(("b", "c")), "disjoint segments must not emit a row")
    assert(got.size == 2)
  }

  test("mv retraction drops a cell whose every event is deleted, keeps partial cells") {
    val s = spark; import s.implicits._
    // cell (x, day1): ids 1,2,3 survive; cell (y, day1): ids 37,74 —
    // both ≡ 0 (mod 37) — are fully retracted. The merged view must
    // contain ONLY the x cell (a zero-count y row would diverge from
    // a recompute).
    val dir = Files.createTempDirectory("graft-retract").toString
    val dayUs = 86400L * 1000000L
    Seq((1L, "x"), (2L, "x"), (3L, "x"), (37L, "y"), (74L, "y"))
      .toDF("event_id", "event_type")
      .select($"event_id", timestamp_micros(lit(dayUs) + $"event_id" * 1000000L).as("ts"),
        lit(1L).as("user_id"), $"event_type", lit(2.5).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Behavioral.qMvRetract(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("x", 3L, 7.5)), out.mkString(";"))
  }

  test("join skew audit reports hand-computed shares and herfindahl") {
    val s = spark; import s.implicits._
    // orderkey: 10 uniform keys (hhi 0.1); partkey: one 91-row hot key
    // + 9 singletons (hhi 0.829); suppkey: a single key (hhi 1.0)
    val dir = Files.createTempDirectory("graft-skew").toString
    (0 until 100).map { i =>
      (i.toLong % 10L, if (i < 91) 999L else 1000L + i, 7L)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.qJoinSkewAudit(s, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("l_orderkey") == ((10L, 10L, 0.1, 0.1)), got.toString)
    assert(got("l_partkey") == ((10L, 91L, 0.91, 0.829)), got.toString)
    assert(got("l_suppkey") == ((1L, 100L, 1.0, 1.0)), got.toString)
  }

  test("peak concurrency counts a hand-built overlap stack, starts before ends on ties") {
    val s = spark; import s.implicits._
    // Sessions (one user each, single-day): A 10:00-11:00,
    // B 10:30-12:00, C 10:45-11:30, D 11:00-11:10 (D starts EXACTLY
    // when A ends — the tie contract counts the start first, so the
    // instant 11:00 holds A,B,C,D = 4). Peak must be 4.
    val dir = Files.createTempDirectory("graft-conc").toString
    val base = 86400L * 1000000L // day 1
    def m(min: Long) = base + min * 60L * 1000000L
    val spans = Seq((1L, 600L, 660L), (2L, 630L, 720L), (3L, 645L, 690L), (4L, 660L, 670L))
    var id = 0L
    spans.flatMap { case (u, a, b) =>
      // events every 20 min so the 30-min-gap sessionizer keeps each
      // span ONE session with exactly [a, b] as its extent
      ((a until b by 20L) :+ b).map { t => id += 1; (id, m(t), u) }
    }.toDF("event_id", "us", "user_id")
      .select($"event_id", timestamp_micros($"us").as("ts"), $"user_id",
        lit("click").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val peaks = graft.operators.Relational.qPeakConcurrency(s, dir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(peaks.values.max == 4L, s"hand-built stack peaks at 4: $peaks")
  }

  test("cuped with a perfect covariate removes all outcome variance and arm imbalance") {
    val s = spark; import s.implicits._
    // user u: pre value = u (day 1), post value = 2u + 3 (day 30).
    // Perfect linear covariate ⇒ θ = 2, var_reduction = 1, and the
    // adjusted means of the parity arms coincide EXACTLY even though
    // the raw means differ (odd vs even u) — the readout CUPED exists
    // to produce.
    val dir = Files.createTempDirectory("graft-cuped").toString
    val dayUs = 86400L * 1000000L
    var id = 0L
    (1 to 40).flatMap { u =>
      Seq((1, u.toDouble), (30, 2.0 * u + 3.0)).map { case (d, v) =>
        id += 1; (id, d.toLong * dayUs, u.toLong, v)
      }
    }.toDF("event_id", "us", "user_id", "value")
      .select($"event_id", timestamp_micros($"us").as("ts"), $"user_id",
        lit("click").as("event_type"), $"value", lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Experimentation.qAbtestCuped(s, dir).collect().head
    val (meanA, meanB) = (r.getDouble(2), r.getDouble(3))
    val (theta, adjA, adjB, vr) =
      (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(meanA != meanB, "parity arms are x-imbalanced by construction")
    assert(theta == 2.0, s"theta must recover the true slope: $theta")
    assert(vr == 1.0, s"perfect covariate must explain all variance: $vr")
    assert(adjA == adjB, s"adjustment must cancel the imbalance: $adjA vs $adjB")
  }

  test("kaplan-meier survival matches hand-computed values and censors the living") {
    val s = spark; import s.implicits._
    // study span days 1-30 (end = 30, censor cut = day 23):
    // u1 T=4 churn, u2 T=9 churn, u5 T=9 churn, u3 T=24 censored,
    // u4 T=29 censored. Hand KM: S(4)=4/5=0.8, S(9)=0.8·(1-2/4)=0.4,
    // then flat — censored users must NOT drop the curve.
    val dir = Files.createTempDirectory("graft-km").toString
    val dayUs = 86400L * 1000000L
    val spans = Seq((1L, 1, 5), (2L, 1, 10), (3L, 2, 26), (4L, 1, 30), (5L, 3, 12))
    var id = 0L
    spans.flatMap { case (u, a, b) =>
      Seq(a, b).map { d => id += 1; (id, d.toLong * dayUs, u, "click") }
    }.toDF("event_id", "us", "user_id", "event_type")
      .select($"event_id", timestamp_micros($"us").as("ts"), $"user_id",
        $"event_type", lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val km = Behavioral.qSurvivalKm(s, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(km(4) == ((5L, 1L, 0L, 0.8)), km.toString)
    assert(km(9) == ((4L, 2L, 0L, 0.4)), km.toString)
    assert(km(24)._4 == 0.4 && km(24)._3 == 1L, "censoring must not drop survival")
    assert(km(29)._4 == 0.4 && km(29)._3 == 1L, km.toString)
  }

  test("lateness audit buckets the out-of-order arrival by its watermark gap") {
    val rows = Behavioral.qLateness(spark, latenessDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // click: 2 in-order (the first event and the one advancing the max)
    // + 1 regressor 5 s late -> the 1-10 s bucket with max_late_us = 5e6
    assert(rows(("click", "0_in_order")) == ((2L, 0L)))
    assert(rows(("click", "2_lt_10s")) == ((1L, 5000000L)))
    assert(rows(("view", "0_in_order")) == ((2L, 0L)))
    assert(rows.size == 3, s"unexpected buckets: ${rows.keys}")
  }

  test("mann-whitney and ks: separated arms read significant, identical arms read exactly null") {
    val s = spark; import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    def writeEvents(dir: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.map { case (eid, uid, v) => (eid, t0, uid, "click", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    // every even user (arm A) strictly above every odd user (arm B)
    val sep = Files.createTempDirectory("graft-mw-sep").toString
    writeEvents(sep, (0L until 40L).map(u =>
      (u, u, if (u % 2 == 0) 1000.0 + u else 1.0 + u)))
    val mw = Experimentation.qMannWhitney(s, sep).collect()(0)
    assert(mw.getLong(0) == 20L && mw.getLong(1) == 20L)
    assert(mw.getDouble(2) == 400.0, s"complete separation must max U_A: ${mw.getDouble(2)}")
    assert(mw.getBoolean(4), "complete separation must be significant")
    val ks = Experimentation.qKsTest(s, sep).collect()(0)
    assert(ks.getDouble(2) == 1.0, s"disjoint supports must give D=1: ${ks.getDouble(2)}")
    assert(ks.getBoolean(4))
    // arms with IDENTICAL value multisets: U_A = n·n/2 exactly, z = 0,
    // D = 0 — the tie handling must land on the null, not near it
    val same = Files.createTempDirectory("graft-mw-same").toString
    writeEvents(same, (0L until 40L).map(u => (u, u, 10.0 + (u / 2) % 5)))
    val mw2 = Experimentation.qMannWhitney(s, same).collect()(0)
    assert(mw2.getDouble(2) == 200.0 && mw2.getDouble(3) == 0.0,
      s"identical arms must read U=n²/2, z=0: ${mw2.getDouble(2)}, ${mw2.getDouble(3)}")
    assert(!mw2.getBoolean(4))
    val ks2 = Experimentation.qKsTest(s, same).collect()(0)
    assert(ks2.getDouble(2) == 0.0 && !ks2.getBoolean(4),
      s"identical arms must give D=0: ${ks2.getDouble(2)}")
  }

  test("qte localizes a whales-only shift: flat q25/median, +1000 at q75") {
    val s = spark; import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    // both arms carry identical per-user totals 0..49, except arm A's
    // top 30% (base >= 35) gains +1000: the mean test would scream,
    // but the shift lives ONLY above q75 — qte must read 0 at q25/q50
    // and exactly 1000 at q75
    val rows = (0L until 100L).map { u =>
      val base = (u / 2).toDouble
      val v = if (u % 2 == 0 && base >= 35) base + 1000.0 else base
      (u, t0, u, "click", v, "{}")
    }
    val dir = Files.createTempDirectory("graft-qte").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Experimentation.qQte(s, dir).collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(0.25) == ((12.0, 12.0, 0.0)), out.toString)
    assert(out(0.5) == ((24.0, 24.0, 0.0)), out.toString)
    assert(out(0.75)._3 == 1000.0, s"q75 must carry the whale shift: ${out(0.75)}")
  }

  test("shapley attribution: symmetry on twin channels, efficiency axiom exact on real data") {
    val s = spark; import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    // click and view constructed EXACTLY symmetric: 10 users each
    // solo (5 convert), 10 users touch both (8 convert)
    var id = 0L
    def ev(uid: Long, tpe: String) = { id += 1; (id, t0, uid, tpe, 1.0, "{}") }
    val rows =
      (1L to 10L).flatMap(u => Seq(ev(u, "click")) ++ (if (u <= 5) Seq(ev(u, "purchase")) else Nil)) ++
      (11L to 20L).flatMap(u => Seq(ev(u, "view")) ++ (if (u <= 15) Seq(ev(u, "purchase")) else Nil)) ++
      (21L to 30L).flatMap(u => Seq(ev(u, "click"), ev(u, "view")) ++ (if (u <= 28) Seq(ev(u, "purchase")) else Nil))
    val dir = Files.createTempDirectory("graft-shap").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val phi = Experimentation.qAttributionShapley(s, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(phi("click") == phi("view"),
      s"symmetric channels must tie exactly: $phi")
    // the full mask (all four channels) is unobserved here, so
    // efficiency forces the total credit to v(1111) - v(0000) = 0
    assert(math.abs(phi.values.sum) < 1e-8, s"sum ${phi.values.sum}")
    // real data: sum(phi) = v(full) - v(empty), both recomputed
    // straight from the definition
    val um = graft.sources.Tables.events(s, sfDir).groupBy($"user_id")
      .agg(expr(s"CAST(sum(DISTINCT ${Experimentation.shapleyBitCase}) AS INT)").as("mask"),
        expr("max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)").as("conv"))
      .groupBy($"mask").agg(count(lit(1)).as("n"), sum($"conv").as("c"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    def vOf(m: Int) = um.get(m)
      .map { case (n, c) => math.floor(c.toDouble / n * 1e9 + 0.5) / 1e9 }.getOrElse(0.0)
    val real = Experimentation.qAttributionShapley(s, sfDir).collect().map(_.getDouble(1))
    assert(math.abs(real.sum - (vOf(15) - vOf(0))) < 1e-7,
      s"efficiency: ${real.sum} vs ${vOf(15) - vOf(0)}")
  }

  test("forecast backtest: constant series scores zero, holt beats naive on a ramp, rmse >= mae always") {
    val s = spark; import s.implicits._
    val dayUs = 86400L * 1000000L
    def write(dir: String, counts: Seq[Int], tpe: String): Unit = {
      var id = 0L
      counts.zipWithIndex.flatMap { case (n, d) =>
        (0 until n).map { i =>
          id += 1
          (id, new java.sql.Timestamp(((d + 1).toLong * dayUs + i * 1000000L) / 1000L), (i % 7).toLong, tpe, 1.0, "{}")
        }
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    // constant volume: every model forecasts it exactly — MAE/RMSE 0
    val cdir = Files.createTempDirectory("graft-bt-const").toString
    write(cdir, Seq.fill(20)(42), "flat")
    Behavioral.qForecastBacktest(s, cdir).collect().foreach { r =>
      assert(r.getLong(2) == 19L, r.toString)
      assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0,
        s"constant series must score 0: $r")
    }
    // linear ramp 10, 15, 20, ... over 60 days: naive is ALWAYS off by
    // exactly the slope (MAE = 5); holt learns the trend and converges
    // to ~0 error, so it must dominate; EWMA lags hardest
    val rdir = Files.createTempDirectory("graft-bt-ramp").toString
    write(rdir, (0 until 60).map(d => 10 + 5 * d), "ramp")
    val byModel = Behavioral.qForecastBacktest(s, rdir).collect()
      .map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(byModel("naive") == 5.0, s"naive on a slope-5 ramp: ${byModel("naive")}")
    assert(byModel("holt") < byModel("naive"),
      s"holt must learn the trend: ${byModel("holt")} vs ${byModel("naive")}")
    assert(byModel("ewma") > byModel("naive"),
      s"ewma must lag a ramp hardest: ${byModel("ewma")} vs ${byModel("naive")}")
    // real data: rmse dominates mae (Jensen), n = days - 1 per type
    Behavioral.qForecastBacktest(s, sfDir).collect().foreach { r =>
      assert(r.getDouble(4) >= r.getDouble(3) - 1e-9, s"rmse < mae: $r")
    }
  }

  test("changepoint lands on the exact shift day with the segment means") {
    val s = spark; import s.implicits._
    // days 1-20 alternate 99/101 (mean 100), days 21-30 run at 150:
    // the best single split is after day 20 exactly
    val dir = Files.createTempDirectory("graft-chgpt").toString
    val dayUs = 86400L * 1000000L
    var id = 0L
    val rows = (1 to 30).flatMap { d =>
      val n = if (d <= 20) { if (d % 2 == 0) 99 else 101 } else 150
      (0 until n).map { i =>
        id += 1
        (id, new java.sql.Timestamp((d.toLong * dayUs + i * 1000000L) / 1000L), (i % 7).toLong, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Behavioral.qChangepoint(s, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(2) == 20L && r(0).getLong(3) == 10L,
      s"split must isolate the 20/10 segments: ${r(0)}")
    assert(r(0).getDouble(4) == 100.0, s"mean_before ${r(0).getDouble(4)}")
    assert(r(0).getDouble(5) == 150.0, s"mean_after ${r(0).getDouble(5)}")
    // gain at the true split: (S_A n_B - S_B n_A)^2/(n_A n_B D) =
    // (2000*10 - 1500*20)^2 / (20*10*30) = 1e8/6000
    assert(math.abs(r(0).getDouble(6) - 1.0e8 / 6000.0) < 1e-3, r(0).toString)
  }

  test("holt-winters: a perfectly periodic series forecasts itself exactly, and the lag-m chain holds on real data") {
    val s = spark; import s.implicits._
    // 4 weeks of a pure weekly cycle [10..70], sum 280 → mean 40
    // exact: every recurrence stays on exact doubles, so the
    // one-step forecast must equal the actual COUNT exactly, trend
    // pinned at 0, level at 40
    val dir = Files.createTempDirectory("graft-hw").toString
    val pattern = Array(10, 20, 30, 40, 50, 60, 70)
    var id = 0L
    val rows = (0 until 28).flatMap { d =>
      (0 until pattern(d % 7)).map { i =>
        id += 1
        (id, java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2025, 1, 1, 0, 0).plusDays(d).plusSeconds(i)),
          i.toLong, "clk", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Behavioral.qHoltWinters(s, dir).collect()
    assert(out.length == 21, s"28 days - 7 warmup = 21 rows, got ${out.length}")
    out.foreach { r =>
      assert(r.getDouble(6) == r.getLong(2).toDouble,
        s"periodic series must forecast itself exactly: ${r.getDate(1)} f=${r.getDouble(6)} x=${r.getLong(2)}")
      assert(r.getDouble(4) == 0.0, s"trend must stay 0: ${r.getDouble(4)}")
      assert(r.getDouble(3) == 40.0, s"level must stay at the mean: ${r.getDouble(3)}")
    }
    // real data: the emitted state must satisfy the defining chain
    // f_t = l_{t-1} + b_{t-1} + sn_{t-m} wherever sn_{t-m} is emitted
    val real = Behavioral.qHoltWinters(s, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(real.nonEmpty)
    real.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      for (t <- (Behavioral.hwPeriod) until sorted.length) {
        val (_, _, _, _, snLag, _) = sorted(t - Behavioral.hwPeriod)
        val (_, day, _, _, _, f) = sorted(t)
        val (_, _, lPrev, bPrev, _, _) = sorted(t - 1)
        assert(math.abs(f - (lPrev + bPrev + snLag)) < 4e-6,
          s"$day: f=$f vs ${lPrev + bPrev + snLag}")
      }
    }
  }

  test("anova: separated arms read significant, identical arm multisets read F = 0 exactly") {
    val s = spark; import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    def writeEvents(dir: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.map { case (eid, uid, v) => (eid, t0, uid, "click", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    // arm means 0 / 1000 / 2000 with ±1 within-arm jitter: SSB ≫ SSW
    val sep = Files.createTempDirectory("graft-anova-sep").toString
    writeEvents(sep, (0L until 30L).map(u =>
      (u, u, 1000.0 * (u % 3) + (u % 2))))
    val r = Experimentation.qAnova(s, sep).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 30L)
    assert(r.getDouble(4) > 100.0, s"separated arms must read a large F: ${r.getDouble(4)}")
    assert(r.getBoolean(5))
    // value depends only on u/3, so the three arms carry IDENTICAL
    // per-user multisets: SSB must land on 0 exactly (quantized), F = 0
    val same = Files.createTempDirectory("graft-anova-same").toString
    writeEvents(same, (0L until 30L).map(u => (u, u, 10.0 + (u / 3))))
    val r2 = Experimentation.qAnova(s, same).collect()(0)
    assert(r2.getDouble(2) == 0.0, s"identical arms must read SSB=0: ${r2.getDouble(2)}")
    assert(r2.getDouble(4) == 0.0 && !r2.getBoolean(5))
  }

  test("anova: an empty arm (k=2) is judged against the F(1,inf) cutoff, not the 3-arm one") {
    val s = spark; import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    // only users with uid%3 in {0,1} → k=2 arms. Jitter tuned so
    // 2.995732 < F < 3.841459: anti-conservative under the fixed
    // 3-arm cutoff, NOT significant under the correct F(1,inf).
    // With arm means 0/d and within-arm variance ~s², F ≈ n·d²/(4s²);
    // search a d that lands F in the open interval.
    def events(d: Double) = (0L until 60L).filter(_ % 3 != 2).map { u =>
      (u, t0, u, "click", d * (u % 3) + 3.0 * (u % 5), "{}") }
    val dir = Files.createTempDirectory("graft-anova-k2").toString
    val f = (1 to 60).view.map { i =>
      val d = 0.1 * i
      events(d).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      Experimentation.qAnova(s, dir).collect()(0)
    }.find { r => r.getDouble(4) > 2.995732 && r.getDouble(4) < 3.841459 }
      .getOrElse(fail("no jitter scale landed F between the k=3 and k=2 cutoffs"))
    assert(f.getLong(0) == 2L, s"expected k=2, got ${f.getLong(0)}")
    assert(!f.getBoolean(5),
      s"F=${f.getDouble(4)} is under the F(1,inf)=3.841459 cutoff and must NOT read significant")
  }

  test("abtest: a single-user arm yields NULL t_stat, never an engine-dependent inf/NaN") {
    val s = spark; import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    // arm A (even uid) has ONE user; arm B has many → v_a undefined
    val dir = Files.createTempDirectory("graft-welch-degen").toString
    val rows = Seq((0L, t0, 0L, "click", 5.0, "{}")) ++
      (0L until 10L).map(i => (i + 1L, t0, 2 * i + 1L, "click", 1.0 + i, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Experimentation.qAbtest(s, dir).collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 10L)
    assert(!r.isNullAt(3) && !r.isNullAt(4), "means stay defined for non-empty arms")
    assert(r.isNullAt(5), s"t_stat must be NULL for a 1-user arm, got ${r.get(5)}")
    // zero pooled variance (both arms constant) must also read NULL
    val dir2 = Files.createTempDirectory("graft-welch-const").toString
    (0L until 20L).map(u => (u, t0, u, "click", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val r2 = Experimentation.qAbtest(s, dir2).collect()(0)
    assert(r2.isNullAt(5), s"zero-variance arms must read NULL t_stat, got ${r2.get(5)}")
  }

  test("fdr bh: a real effect is rejected, a null metric is not, and rejections are a p-ordered prefix") {
    val s = spark; import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-06-01 12:00:00")
    // metric "moved": even users (arm A) at value 1000+jitter, odd at
    // 1+jitter — a z far past any threshold. metric "flat": value is a
    // function of u/2 only, so the two arms are identical multisets
    // (z = 0, p = 1) — BH must reject "moved" and keep "flat".
    val dir = Files.createTempDirectory("graft-fdr").toString
    val rows =
      (0L until 40L).map(u => (u, t0, u, "moved", if (u % 2 == 0) 1000.0 + u else 1.0 + u, "{}")) ++
      (0L until 40L).map(u => (1000L + u, t0, u, "flat", 10.0 + (u / 2) % 5, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Experimentation.qFdrBh(s, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3), r.getBoolean(6))).toMap
    assert(out("moved")._3, s"separated arms must be rejected: ${out("moved")}")
    assert(!out("flat")._3, s"identical arms must not be rejected: ${out("flat")}")
    assert(out("flat")._1 > 0.9, s"z=0 must read p≈1: ${out("flat")._1}")
    assert(out("moved")._2 < out("flat")._2, "the effect must rank first")
    // step-up structure on the real corpus: rejected rows form a
    // prefix of the p-ascending order (BH's defining invariant)
    val real = Experimentation.qFdrBh(s, sfDir).collect()
      .sortBy(_.getLong(3)).map(_.getBoolean(6))
    assert(!real.sliding(2).exists(p => p.length == 2 && !p(0) && p(1)),
      s"rejections must be a prefix: ${real.mkString(",")}")
  }

  test("stl decomposition: components reconstruct y and seasonal means center the detrended series") {
    val s = spark; import s.implicits._
    val rows = Behavioral.qStlDecompose(s, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // identity: resid is defined as y − trend − seasonal (rounded), so
    // the components must reconstruct y within the 1e-6 quantum
    rows.foreach { case (t, d, y, tr, se, re) =>
      assert(math.abs(y - (tr + se + re)) < 2e-6, s"($t,$d): $y vs ${tr + se + re}")
    }
    // centering: seasonal is the per-(type, dow) MEAN of the
    // detrended series, so per-group residuals sum to ~0 (rounding
    // accumulates at most n × 1e-6)
    rows.groupBy { case (t, d, _, _, _, _) =>
      (t, java.time.LocalDate.parse(d.toString).getDayOfWeek)
    }.foreach { case (g, rs) =>
      val sumRe = rs.map(_._6).sum
      assert(math.abs(sumRe) < rs.size * 2e-6, s"$g residuals off-center: $sumRe")
    }
  }
}
