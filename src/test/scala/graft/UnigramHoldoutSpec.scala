package graft

import java.security.MessageDigest

import graft.operators.{Pipeline, Unigram}

/** tokenizer_holdout_fertility (42j): the train-split model applied
  * to held-out text. The planted case: a VAL-split document written
  * in an alphabet the train split never saw — its words must fall
  * back to character pieces (the OOV coalesce, reachable here by
  * construction), driving val fertility above train fertility. */
class UnigramHoldoutSpec extends SparkSpec {

  private def splitOf(docId: Long): String = {
    val h = MessageDigest.getInstance("MD5")
      .digest(s"${Pipeline.splitSeed}:$docId".getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString
    if (h < f"${(65536 * 0.01).toInt}%04x") "test"
    else if (h < f"${(65536 * 0.02).toInt}%04x") "val"
    else "train"
  }

  test("held-out alien-alphabet words char-split; val fertility exceeds train") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-holdout").toString
    val valId = (0L until 4096L).find(splitOf(_) == "val").get
    val trainIds = (0L until 4096L).filter(splitOf(_) == "train").take(40)
    // train docs: a small repetitive latin vocabulary the trainer fits
    val trainRows = trainIds.map(id =>
      (id, "alpha beta gamma alpha beta delta alpha gamma", "en", "web"))
    // the val doc: Greek letters — characters absent from training
    val valRow = (valId, "αβγδ εζηθ ικλμ", "el", "web")
    (trainRows :+ valRow).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val segs = Unigram.holdoutSegsDf(s, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // alien words fall back to one piece per character
    Seq("αβγδ", "εζηθ", "ικλμ").foreach { w =>
      assert(segs(w) == w.length.toLong, s"$w -> ${segs(w)} pieces")
    }
    // trained words segment into fewer pieces than characters
    assert(segs("alpha") < 5L, s"alpha -> ${segs("alpha")}")
    val fert = Unigram.tokenizerHoldoutFertility(s, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(fert.keySet == Set("train", "val"), fert.toString)
    assert(fert("val") > fert("train"),
      s"val ${fert("val")} must exceed train ${fert("train")}")
  }
}
