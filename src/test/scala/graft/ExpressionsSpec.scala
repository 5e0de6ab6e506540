package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) equivalence properties for the
  * native expressions against their composed-builtin formulations. */
class ExpressionsSpec extends SparkSpec {

  private val rng = new Random(42)

  test("graft_dot equals the aggregate/zip_with formulation") {
    val s = spark; import s.implicits._
    val vecs = Seq.fill(50)((
      Seq.fill(64)(rng.nextDouble() * 2 - 1),
      Seq.fill(64)(rng.nextDouble() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      expr("graft_dot(a, b)"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bit-identical
  }

  test("graft_shingles equals the transform/slice/array_join formulation") {
    val s = spark; import s.implicits._
    val docs = Seq.fill(40)(Seq.fill(3 + rng.nextInt(60))(s"w${rng.nextInt(20)}"))
    val df = docs.toDF("toks")
    val rows = df.select(
      expr("graft_shingles(toks)"),
      expr("array_distinct(transform(sequence(1, size(toks) - 2), i -> array_join(slice(toks, i, 3), ' ')))"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0).toList == r.getSeq[String](1).toList)
    }
  }

  test("graft_fingerprint equals the aggregate/transform formula") {
    val s = spark; import s.implicits._
    val docs = Seq.fill(60)(
      Seq.fill(1 + rng.nextInt(80))(
        rng.alphanumeric.take(1 + rng.nextInt(10)).mkString)) :+ Seq("")
    val rows = docs.toDF("toks").select(
      expr("graft_fingerprint(toks)"),
      expr(graft.operators.TextAnalysis.fingerprintFormulaExpr))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_shingles yields empty for docs shorter than 3 tokens") {
    val s = spark; import s.implicits._
    val rows = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c"))
      .toDF("toks").select(expr("graft_shingles(toks)")).collect()
    assert(rows.map(_.getSeq[String](0).size).toList == List(0, 0, 1))
  }

  test("minhash signature estimate tracks true jaccard") {
    val s = spark; import s.implicits._
    // pairs of shingle sets with controlled overlap
    val universe = (0 until 400).map(i => s"sh$i")
    val pairs = (1 to 30).map { _ =>
      val overlap = rng.nextInt(100)
      val aOnly = rng.nextInt(80)
      val bOnly = rng.nextInt(80)
      val shuffled = rng.shuffle(universe).toIndexedSeq
      val common = shuffled.take(overlap)
      val a = common ++ shuffled.slice(overlap, overlap + aOnly)
      val b = common ++ shuffled.slice(overlap + aOnly, overlap + aOnly + bOnly)
      (a, b)
    }.filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      expr("CAST(size(filter(zip_with(graft_minhash64(a), graft_minhash64(b), (x, y) -> x = y), m -> m)) AS DOUBLE) / 64").as("est"),
      expr("CAST(size(array_intersect(a, b)) AS DOUBLE) / size(array_union(a, b))").as("true_j"))
      .collect()
    rows.foreach { r =>
      val (est, truth) = (r.getDouble(0), r.getDouble(1))
      // k=64 → σ ≈ sqrt(j(1-j)/64) ≤ 0.0625; 4σ bound
      assert(math.abs(est - truth) <= 0.25, s"est=$est true=$truth")
    }
    // and it is discriminative on aggregate: high-j pairs estimate higher
    val (hi, lo) = rows.partition(_.getDouble(1) >= 0.5)
    if (hi.nonEmpty && lo.nonEmpty) {
      val hiAvg = hi.map(_.getDouble(0)).sum / hi.length
      val loAvg = lo.map(_.getDouble(0)).sum / lo.length
      assert(hiAvg > loAvg)
    }
  }

  test("simhash of similar token multisets is closer than dissimilar") {
    val s = spark; import s.implicits._
    val base = Seq.fill(80)(s"t${rng.nextInt(30)}")
    val near = base.updated(5, "XX").updated(50, "YY")
    val far = Seq.fill(80)(s"u${rng.nextInt(30)}")
    val rows = Seq((base, near, far)).toDF("a", "b", "c")
      .select(
        expr("bit_count(graft_simhash64(a) ^ graft_simhash64(b))"),
        expr("bit_count(graft_simhash64(a) ^ graft_simhash64(c))"))
      .head()
    assert(rows.getInt(0) < rows.getInt(1))
  }

  test("graft_hilbert: bijective over cells and every curve step is grid-adjacent") {
    val s = spark; import s.implicits._
    // one point per cell of the 32x32 top-bits subgrid: each cell owns
    // a contiguous 2048^2-sized block of the curve, so d div 2048^2
    // must enumerate 0..1023 exactly (bijectivity), and consecutive
    // blocks must sit in grid-adjacent cells (the Hilbert continuity
    // property — Z-order fails this: its quadrant seams jump)
    val cells = for (i <- 0 until 32; j <- 0 until 32)
      yield (i.toLong * 2048L, j.toLong * 2048L)
    val d = cells.toDF("x", "y")
      .selectExpr("x", "y", "graft_hilbert(x, y) AS d")
      .collect()
      .map(r => (r.getLong(2) / (2048L * 2048L), r.getLong(0) / 2048L,
        r.getLong(1) / 2048L))
      .sortBy(_._1)
    assert(d.map(_._1).toSeq == (0L until 1024L), "block ids must be 0..1023")
    d.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1L,
        s"curve step ($x1,$y1)->($x2,$y2) is not grid-adjacent")
    }
  }

  test("native expressions stay inside whole-stage codegen spans") {
    val df = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
      .selectExpr("doc_id",
        "graft_minhash64(graft_shingles(toks)) AS sig",
        "graft_simhash64(toks) AS sh",
        "graft_count_in(toks, array('a', 'b')) AS cnt",
        "graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot",
        "graft_hilbert(doc_id, n_chars) AS hil")
    // CodegenFallback expressions force their ProjectExec OUT of
    // WholeStageCodegen: every Project here must carry the *(n) mark
    val plan = df.queryExecution.executedPlan.toString
    val projects = plan.linesIterator.filter(_.contains("Project")).toList
    assert(projects.nonEmpty)
    projects.foreach(l =>
      assert(l.contains("*("), s"Project outside whole-stage codegen:\n$plan"))
    assert(df.limit(1).collect().length == 1)
  }

  test("graft_normalize: NFC composition, simple lowercase, whitespace collapse") {
    val s = spark; import s.implicits._
    val cases = Seq(
      // decomposed e + combining acute must compose THEN lowercase
      ("Café  DU  MONDE", "café du monde"),
      // simple (context-free) sigma mapping: both Σ map to σ, never ς
      ("ΣΙΣΥΦΟΣ", "σισυφοσ"),
      // ragged ASCII whitespace collapses; ends trim
      ("  a\t\tb\r\nc\f d ", "a b c d"),
      // NBSP is NOT in the ASCII class — it is data, preserved
      ("a b", "a b"),
      ("", ""))
    val rows = cases.map(_._1).toDF("t")
      .selectExpr("graft_normalize(t)").as[String].collect()
    rows.zip(cases).foreach { case (got, (in, want)) =>
      assert(got == want, s"normalize(${in.replace("\n", "\\n")}) = $got, want $want")
    }
    // parity with the oracle formulation on real corpus text
    val viaExpr = graft.sources.Tables.documents(s, sfDir)
      .selectExpr("doc_id", "graft_normalize(text) AS n").as[(Long, String)]
      .collect().toMap
    val viaSql = graft.sources.Tables.documents(s, sfDir)
      .selectExpr("doc_id",
        """trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0b]+', ' ')) AS n""")
      .as[(Long, String)].collect().toMap
    // Spark lacks an NFC builtin — corpus text must already be NFC for
    // this cross-formulation check (true of the generated corpus); the
    // literal cases above pin the NFC behavior itself. Same caveat for
    // case mapping: graft_normalize lowercases per code point (simple
    // mapping, matching DuckDB's lower()) while Spark's lower() is
    // full context-sensitive mapping (final sigma Σ→ς, İ→i+̇), so this
    // parity check also assumes the corpus has no Greek/Turkish text —
    // the ΣΙΣΥΦΟΣ literal case above pins the intended simple mapping
    assert(viaExpr == viaSql)
  }

  test("native matvec family rejects malformed inputs loudly, never reads garbage") {
    val s = spark
    def fails(sql: String): Unit = {
      val e = intercept[Exception](s.sql(s"SELECT $sql").collect())
      // unwrap SparkException task-failure nesting
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("out of range") ||
        m.contains("null element") || m.contains("codebooks need")),
        s"wrong failure for [$sql]: $e")
    }
    // graft_adc: out-of-range code (UnsafeArrayData would silently
    // read a neighbor slot)
    fails("graft_adc(array(array(1.0D, 2.0D)), array(5))")
    fails("graft_adc(array(array(1.0D, 2.0D)), array(-1))")
    // graft_adc: NULL code (getInt would silently read it as 0 — a
    // VALID index, so the bounds check alone never fires)
    fails("graft_adc(array(array(1.0D, 2.0D)), array(CAST(NULL AS INT)))")
    // graft_pq_encode: vector shorter than the codebooks' width
    fails("graft_pq_encode(array(1.0D), array(array(array(1.0D, 2.0D))))")
    // null elements in the hot loops (getDouble would read 0.0)
    fails("graft_matvec(array(array(1.0D, CAST(NULL AS DOUBLE))), array(1.0D, 2.0D))")
    fails("graft_qmatvec(array(1.0D, CAST(NULL AS DOUBLE)), array(array(1.0D, 2.0D)))")
    fails("graft_qmatvec_c(array(1.0D, CAST(NULL AS DOUBLE)), array(0.0D, 0.0D), array(array(1.0D, 2.0D)))")
    // healthy inputs still work
    val ok = s.sql(
      "SELECT graft_adc(array(array(1.0D, 2.0D)), array(1)) AS a, " +
      "graft_pq_encode(array(1.0D, 2.0D), array(array(array(1.0D, 2.0D)))).err AS e")
      .collect()(0)
    assert(ok.getDouble(0) == 2.0 && ok.getDouble(1) == 0.0)
  }
}
