package graft

import graft.operators.QualityModel

class QualityModelSpec extends SparkSpec {

  // sf0.01: 500 docs, 197 above the mean-quality cut (majority 0.606)
  private val dir = "/root/testdata/sf0.01"

  test("GD training learns the heuristic's decision boundary") {
    val r = QualityModel.qualityModelTrain(spark, dir).collect()(0)
    val (wStop, wTtr, wLen) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val acc = r.getDouble(6)
    // the distilled rule is 0.4(1-stop)+0.4 ttr+0.2 len > cut: the
    // learned weights must recover its signs...
    assert(wStop < 0 && wTtr > 0 && wLen > 0, s"($wStop, $wTtr, $wLen)")
    // ...and the fit must decisively beat the majority class (0.606)
    assert(acc >= 0.8, s"train_acc $acc")
  }

  test("calibration table is populated and ordered in probability") {
    val rows = QualityModel.qualityModelCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    // standardized features spread predictions across the deciles
    assert(rows.length >= 8, s"only ${rows.length} buckets populated")
    assert(rows.map(_._2).sum == 500L)
    // mean_p strictly increases with the bucket (bucket = floor(10p))
    rows.sliding(2).foreach { case Array((_, _, p1, _), (_, _, p2, _)) =>
      assert(p1 < p2, s"mean_p not increasing: $p1 -> $p2")
    }
    // the extremes separate hard: bottom decile nearly no positives,
    // top decile nearly all
    assert(rows.head._4 <= 0.1, s"bottom pos_rate ${rows.head._4}")
    assert(rows.last._4 >= 0.95, s"top pos_rate ${rows.last._4}")
  }
}
