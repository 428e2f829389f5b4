package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRecord}

class MultimodalSpec extends SparkSpec {

  private def records = {
    import spark.implicits._
    Seq(
      MediaRecord(1L, "fake-jpeg-bytes-aaaa".getBytes("UTF-8"),
        MediaMeta("image", 1920, 1080, 3, 0, 0)),
      MediaRecord(2L, "fake-wav-bytes".getBytes("UTF-8"),
        MediaMeta("audio", 0, 0, 1, 16000, 0)),
      MediaRecord(3L, "fake-mp4".getBytes("UTF-8"),
        MediaMeta("video", 640, 480, 3, 0, 10)),
      MediaRecord(4L, Array.emptyByteArray, MediaMeta("image", 8, 8, 1, 0, 0))
    ).toDS()
  }

  test("decodeAndFeaturize is deterministic and partition-shape independent") {
    val a = Multimodal.decodeAndFeaturize(records, dim = 8)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.decodeAndFeaturize(records.repartition(7), dim = 8)
      .collect().sortBy(_.doc_id)
    assert(a.length == 4)
    assert(a.map(_.content_id).toSeq == b.map(_.content_id).toSeq)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a.forall(_.features.length == 8))
    assert(a.find(_.doc_id == 1L).get.n_bytes == 20L)
    // sha-256 of empty payload is the well-known constant
    assert(a.find(_.doc_id == 4L).get.content_id ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("resizePlan computes aspect-correct bounded dims") {
    val out = Multimodal.resizePlan(records.toDF(), maxSide = 960)
      .select("doc_id", "target_width", "target_height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) == ((960, 540)))  // 1920x1080 halved
    assert(out(4L) == ((8, 8)))      // already small: unchanged
  }

  test("frameSamplePlan explodes every k-th frame for videos only") {
    val frames = Multimodal.frameSamplePlan(records.toDF(), everyK = 4)
      .select("doc_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.toSeq.sorted == Seq((3L, 0), (3L, 4), (3L, 8)))
  }

  test("features feed the vector ops: quantized_cosine over decoded output") {
    graft.functions.GraftFunctions.register(spark)
    val d = Multimodal.decodeAndFeaturize(records, dim = 8).toDF()
    val sim = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(call_function("quantized_cosine", col("a.features"), col("b.features")).as("c"))
      .collect()
    assert(sim.length == 6)
  }
}
