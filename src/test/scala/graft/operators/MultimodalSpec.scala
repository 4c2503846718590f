package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("media binary round-trips the utf-8 text bytes") {
    val r = Multimodal.mediaTable(spark, sf).orderBy("doc_id").head()
    assert(new String(r.getAs[Array[Byte]]("media"), "UTF-8").nonEmpty)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(r.getAs[String]("mime")))
  }

  test("stub decode is deterministic with the declared batch shape") {
    val a = Multimodal.extractFeatures(spark, sf).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(spark, sf).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 4))
    assert(a.values.forall(_.forall(x => x >= 0.0f && x < 1.0f)))
  }

  test("phash pairs: byte-identical media collide at hamming 0; bounds hold") {
    import org.apache.spark.sql.functions._
    val sf01 = "/root/testdata/sf0.01" // sf0.001 has no exact dupes
    val pairs = Multimodal.phashPairs(spark, sf01).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall { r =>
      val h = r.getLong(2); h >= 0 && h <= Multimodal.PhashMaxHamming
    })
    // the sf0.01 fixture's mutated near-dup docs must surface
    assert(pairs.nonEmpty)
    // determinism: a second evaluation yields the identical pair set
    val again = Multimodal.phashPairs(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("frame sampling yields nFrames rows per doc") {
    val counts = Multimodal.frameSample(spark, sf).groupBy("doc_id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(counts == Set(4L))
  }
}
