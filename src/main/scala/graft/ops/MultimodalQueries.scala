package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Gate query for the multimodal plumbing's SQL-expressible surface: binary
  * payload column + derived metadata (byte length, magic tag, content
  * digest, sniffed type). The mapPartitions decode path is covered by
  * ScalaTest (graft.multimodal) — it is deliberately not SQL-expressible.
  */
object MultimodalQueries {

  def binaryStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blob = $"text".cast("binary")
    Tables.documents(spark, dir).select(
      $"doc_id",
      length(blob).cast("int").as("byte_len"),
      substring(lower(hex(blob)), 1, 16).as("magic_hex"),
      md5(blob).as("content_md5"),
      when(length(blob) % 3 === 0, "image")
        .when(length(blob) % 3 === 1, "audio")
        .otherwise("video").as("media_type"))
  }

  /** REAL-DECODE gate (q167, VERDICT r8 #4): the `mapPartitions` codec
    * ([[graft.multimodal.Multimodal.decodeBmp]]/`decodePpm` behind
    * `sniffDecode`) put under the DuckDB oracle, not just ScalaTest. Each
    * document id deterministically defines a small image — `width = id%13+1`,
    * `height = id%7+1`, pixel byte k = `(id%251 + k) % 256` in top-down RGB
    * order — which the gate ENCODES (even ids as bottom-up padded BMP, odd
    * as binary PPM: both real container formats, exercising row padding,
    * the vertical flip, and BGR→RGB), then DECODES through the production
    * codec, emitting integer channel sums
    * ([[graft.multimodal.Multimodal.decodeChannelSums]]). The oracle never
    * sees a byte of image data: it recomputes the sums from the closed-form
    * pixel formula, so hash-equality proves the full encode→sniff→decode→
    * normalize chain is bit-exact. Encode and decode are both partition-
    * local passes over the distributed documents scan — no shuffle at all;
    * at 100 TB this is precisely the decode/feature-extract batch shape
    * (`mapInPandas` in the Python analog) with ~300-byte payloads standing
    * in for real media blobs. */
  def decodeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val w = (id % 13 + 1).toInt
      val h = (id % 7 + 1).toInt
      val rgb = Array.tabulate(w * h * 3)(k => ((id % 251 + k) % 256).toByte)
      val payload = if (id % 2 == 0) Multimodal.encodeBmp(w, h, rgb)
                    else Multimodal.encodePpm(w, h, rgb)
      Multimodal.MediaRow(id, payload, "image", payload.length.toLong,
        payload.take(8).map(b => f"${b & 0xff}%02x").mkString)
    }
    Multimodal.decodeChannelSums(media).toDF()
      .withColumnRenamed("media_id", "doc_id")
  }

  /** REAL AUDIO-DECODE gate (q187) — q167's pattern extended to the audio
    * modality, closing the stubbed-decode gap for sound: each document id
    * deterministically defines a PCM16 clip — `n = id%97+16` samples,
    * sample k = `((id%251 + 9973k) % 65536) − 32768` (sweeps the full signed
    * range incl. both clip rails), rate `8000 + (id%4)·4000` — which the
    * gate ENCODES as a RIFF/WAVE container
    * ([[graft.multimodal.Multimodal.encodeWav]]; even ids get an unknown
    * LIST chunk with an odd-size pad byte, so the chunk walker's skip
    * path is on the gated path) and DECODES through the production codec
    * ([[graft.multimodal.Multimodal.decodeAudioSums]]), emitting integer
    * sample stats (Σ|s|, max|s|, clip census). The oracle recomputes them
    * from the closed-form waveform — it never sees a byte of WAV — so
    * hash-equality proves the encode→walk→parse→LE-sample chain bit-exact.
    * Same no-shuffle partition-local batch shape as q167. */
  def audioDecodeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val n = (id % 97 + 16).toInt
      val seed = id % 251
      val samples = Array.tabulate(n)(k => (((seed + 9973L * k) % 65536) - 32768).toShort)
      val rate = (8000 + (id % 4) * 4000).toInt
      val payload = Multimodal.encodeWav(rate, 1, samples, junkChunk = id % 2 == 0)
      Multimodal.MediaRow(id, payload, "audio", payload.length.toLong,
        payload.take(8).map(b => f"${b & 0xff}%02x").mkString)
    }
    Multimodal.decodeAudioSums(media).toDF()
      .withColumnRenamed("media_id", "doc_id")
  }

  /** PATCH-EXTRACTION gate (q311) — q167's encode→decode chain extended by
    * the step every vision-training pipeline runs next: ViT-style 8×8
    * patchification ([[graft.multimodal.Multimodal.patchWeightedSums]]).
    * Images are bigger than q167's (17-32 × 17-24, so the grid is a real
    * 2-4 × 2-3 with truncated right/bottom edges exercising the crop
    * rule), same closed-form pixels, both container formats. The oracle
    * replays pixel → (x, y) → patch-index assignment arithmetically —
    * hash equality proves the tiling geometry, not just the decode (an
    * unweighted sum would collapse to q167's whole-image census). */
  def patchExtraction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val w = (id % 16 + 17).toInt
      val h = (id % 8 + 17).toInt
      val rgb = Array.tabulate(w * h * 3)(k => ((id % 251 + k) % 256).toByte)
      val payload = if (id % 2 == 0) Multimodal.encodeBmp(w, h, rgb)
                    else Multimodal.encodePpm(w, h, rgb)
      Multimodal.MediaRow(id, payload, "image", payload.length.toLong,
        payload.take(8).map(b => f"${b & 0xff}%02x").mkString)
    }
    Multimodal.patchWeightedSums(media, patch = 8).toDF()
      .withColumnRenamed("media_id", "doc_id")
  }

  /** MODALITY-COVERAGE CENSUS (q179): the join-health report a multimodal
    * pipeline runs before training — per source, how many documents have a
    * paired embedding, how many are missing one, and how many embeddings
    * reference no document at all (orphans land in their own
    * '__orphan_embeddings__' row via the full-outer + coalesce). At the
    * sf0.1 bench corpus 3 000 of 5 000 docs lack embeddings, which is
    * exactly the situation this census exists to surface. One full-outer
    * equi-join on the id (shuffle on the join key; at 100 TB both sides
    * are id-bucketable so the join co-locates), one hash-agg; all counts
    * integer. */
  def modalityCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source")
    val embs = Tables.embeddings(spark, dir).select($"vec_id")
    docs.join(embs, docs("doc_id") === embs("vec_id"), "full_outer")
      .select(coalesce($"source", lit("__orphan_embeddings__")).as("source"),
        $"doc_id", $"vec_id")
      .groupBy($"source")
      .agg(count($"doc_id").as("n_docs"),
        sum(when($"doc_id".isNotNull && $"vec_id".isNotNull, 1L).otherwise(0L))
          .as("n_with_embedding"),
        sum(when($"doc_id".isNotNull && $"vec_id".isNull, 1L).otherwise(0L))
          .as("n_missing_embedding"),
        sum(when($"doc_id".isNull, 1L).otherwise(0L)).as("n_orphan_embeddings"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_modality_coverage" -> (modalityCoverage _),
    "q311_patch_extraction" -> (patchExtraction _),
    "q32_multimodal_binary_stats" -> (binaryStats _),
    "q167_multimodal_decode" -> (decodeRoundtrip _),
    "q187_audio_decode" -> (audioDecodeRoundtrip _),
    "q352_audio_energy_windows" -> (audioEnergyWindows _))

  /** WINDOWED AUDIO-ENERGY gate (q352) — q187's decode chain extended by
    * the step an audio-curation pipeline runs next: 16-sample windowed
    * energy + silence census ([[graft.multimodal.Multimodal
    * .decodeAudioWindows]] — the VAD-lite trim signal), over the same
    * closed-form PCM16 clips (so the oracle replays sample → window →
    * Σs²/max|s| arithmetically, never seeing a WAV byte). The final
    * PARTIAL window is scored too — q187's n = id%97+16 is usually not
    * a multiple of 16, so the partial-window path is on the gated path
    * for most docs. Same no-shuffle partition-local batch shape. */
  def audioEnergyWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val n = (id % 97 + 16).toInt
      val seed = id % 251
      val samples = Array.tabulate(n)(k => (((seed + 9973L * k) % 65536) - 32768).toShort)
      val rate = (8000 + (id % 4) * 4000).toInt
      val payload = Multimodal.encodeWav(rate, 1, samples, junkChunk = id % 2 == 0)
      Multimodal.MediaRow(id, payload, "audio", payload.length.toLong,
        payload.take(8).map(b => f"${b & 0xff}%02x").mkString)
    }
    Multimodal.decodeAudioWindows(media).toDF()
      .withColumnRenamed("media_id", "doc_id")
  }

  val oracle: Map[String, String] = Map(
    // q179: same full-outer + coalesce census.
    "q179_modality_coverage" ->
      """SELECT coalesce(d.source, '__orphan_embeddings__') AS source,
        |  CAST(count(d.doc_id) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_embedding,
        |  CAST(sum(CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_embedding,
        |  CAST(sum(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_orphan_embeddings
        |FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY coalesce(d.source, '__orphan_embeddings__')""".stripMargin,
    // q311: closed-form patch replay — pixel p → (x, y) → row-major patch
    // index, partial edges truncated, weight = index + 1; no image bytes.
    "q311_patch_extraction" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 16 + 17 AS INTEGER) AS width,
        |    CAST(doc_id % 8 + 17 AS INTEGER) AS height,
        |    doc_id % 251 AS seed,
        |    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, unnest(generate_series(0, width * height - 1)) AS p
        |  FROM d
        |), wpx AS (
        |  SELECT d.doc_id, d.seed, px.p,
        |    (((px.p // d.width) // 8) * (d.width // 8)
        |      + ((px.p % d.width) // 8) + 1) AS wt
        |  FROM d JOIN px USING (doc_id)
        |  WHERE px.p % d.width < (d.width // 8) * 8
        |    AND px.p // d.width < (d.height // 8) * 8
        |)
        |SELECT d.doc_id, d.format, d.width, d.height,
        |  CAST((d.width // 8) * (d.height // 8) AS BIGINT) AS n_patches,
        |  CAST(sum(wt * ((wpx.seed + 3 * p + 0) % 256)) AS BIGINT) AS wsum_r,
        |  CAST(sum(wt * ((wpx.seed + 3 * p + 1) % 256)) AS BIGINT) AS wsum_g,
        |  CAST(sum(wt * ((wpx.seed + 3 * p + 2) % 256)) AS BIGINT) AS wsum_b
        |FROM d JOIN wpx USING (doc_id)
        |GROUP BY d.doc_id, d.format, d.width, d.height""".stripMargin,
    // q167: pure closed-form replay — sum over pixels p of
    // (seed + 3p + channel) % 256 per channel; no image bytes involved.
    "q167_multimodal_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 13 + 1 AS INTEGER) AS width,
        |    CAST(doc_id % 7 + 1 AS INTEGER) AS height,
        |    doc_id % 251 AS seed,
        |    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, unnest(generate_series(0, width * height - 1)) AS p
        |  FROM d
        |)
        |SELECT d.doc_id, d.format, d.width, d.height,
        |  CAST(d.width * d.height AS BIGINT) AS n_pixels,
        |  CAST(sum((d.seed + 3 * px.p + 0) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((d.seed + 3 * px.p + 1) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((d.seed + 3 * px.p + 2) % 256) AS BIGINT) AS sum_b
        |FROM d JOIN px USING (doc_id)
        |GROUP BY d.doc_id, d.format, d.width, d.height""".stripMargin,
    // q187: closed-form waveform replay — |((seed + 9973k) % 65536) − 32768|
    // per sample; no WAV bytes involved.
    // q352: the q187 closed-form waveform, re-aggregated through the
    // identical k//16 window grid — silence rule max|a| < 8192, energy
    // Σ a², partial final window included.
    "q352_audio_energy_windows" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 97 + 16 AS INTEGER) AS n_i,
        |    doc_id % 251 AS seed
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, unnest(generate_series(0, n_i - 1)) AS k FROM d
        |), v AS (
        |  SELECT d.doc_id, s.k // 16 AS w,
        |    ((d.seed + 9973 * s.k) % 65536) - 32768 AS a
        |  FROM d JOIN s USING (doc_id)
        |), pw AS (
        |  SELECT doc_id, w, sum(a * a) AS energy, max(abs(a)) AS mx
        |  FROM v GROUP BY 1, 2
        |)
        |SELECT d.doc_id, CAST(d.n_i AS BIGINT) AS n_samples,
        |  CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(sum(CASE WHEN mx < 8192 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_silent,
        |  CAST(max(energy) AS BIGINT) AS max_window_energy,
        |  CAST(sum(energy) AS BIGINT) AS total_energy
        |FROM d JOIN pw USING (doc_id)
        |GROUP BY d.doc_id, d.n_i""".stripMargin,
    "q187_audio_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 97 + 16 AS INTEGER) AS n_i,
        |    doc_id % 251 AS seed,
        |    CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, unnest(generate_series(0, n_i - 1)) AS k FROM d
        |), v AS (
        |  SELECT d.doc_id, abs(((d.seed + 9973 * s.k) % 65536) - 32768) AS a
        |  FROM d JOIN s USING (doc_id)
        |)
        |SELECT d.doc_id, 'pcm16' AS format, d.sample_rate,
        |  CAST(1 AS INTEGER) AS n_channels,
        |  CAST(d.n_i AS BIGINT) AS n_samples,
        |  CAST(sum(v.a) AS BIGINT) AS sum_abs,
        |  CAST(max(v.a) AS BIGINT) AS max_abs,
        |  CAST(sum(CASE WHEN v.a >= 32000 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        |FROM d JOIN v USING (doc_id)
        |GROUP BY d.doc_id, d.sample_rate, d.n_i""".stripMargin,
    "q32_multimodal_binary_stats" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |  substr(lower(hex(encode(text))), 1, 16) AS magic_hex,
        |  md5(text) AS content_md5,
        |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'image'
        |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS media_type
        |FROM documents""".stripMargin)
}
