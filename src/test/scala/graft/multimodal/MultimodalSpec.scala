package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "aaaabbbb"), // 8 bytes → media_type video (8 % 3 == 2)
    (2L, "abcdefghi"), // 9 bytes → image
    (3L, "abcdefghij") // 10 bytes → audio
  ).toDF("doc_id", "text")

  test("media table: payload bytes, sniffed type, magic hex") {
    val rows = Multimodal.asMediaTable(docs, "doc_id", "text")
      .collect().map(r => r.media_id -> r).toMap
    assert(rows(1L).byte_len == 8 && rows(1L).media_type == "video")
    assert(rows(2L).byte_len == 9 && rows(2L).media_type == "image")
    assert(rows(3L).byte_len == 10 && rows(3L).media_type == "audio")
    assert(rows(1L).magic_hex == "6161616162626262") // "aaaabbbb" utf-8
    assert(new String(rows(1L).payload, "UTF-8") == "aaaabbbb")
  }

  test("stub decoder: deterministic fixed-shape features, histogram sums to 1") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val feats = Multimodal.decodeImageStub(media, featureDim = 4)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.values.forall(_.features.length == 4))
    feats.values.foreach(f => assert(math.abs(f.features.sum - 1.0f) < 1e-6))
    // determinism: same input → same features
    val again = Multimodal.decodeImageStub(media, featureDim = 4)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(feats.view.mapValues(_.features.toSeq).toMap == again)
    assert(feats(1L).width == 9 && feats(1L).height == 9) // 8%640+1, 8%480+1
  }

  test("resize preserves aspect ratio and never upscales") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val feats = Multimodal.decodeImageStub(media)
    val resized = Multimodal.resizeStub(feats, maxW = 4, maxH = 3)
      .select("media_id", "width", "height", "resized_w", "resized_h")
      .as[(Long, Int, Int, Int, Int)].collect()
    resized.foreach { case (_, w, h, rw, rh) =>
      assert(rw <= 4 && rh <= 3, s"($rw,$rh) exceeds the bounding box")
      assert(rw <= w && rh <= h, "resize must never upscale")
      val scale = math.min(math.min(4.0 / w, 3.0 / h), 1.0)
      assert(rw == math.floor(w * scale).toInt && rh == math.floor(h * scale).toInt)
    }
  }

  test("frame sampling emits one row per stride for video rows only") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val frames = Multimodal.sampleFramesStub(media, stride = 4)
    // only doc 1 is video (8 bytes, stride 4 → offsets 0 and 4)
    assert(frames.select("media_id").distinct().as[Long].collect().toSeq == Seq(1L))
    assert(frames.count() == 2)
  }
}
