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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_multimodal_binary_stats" -> (binaryStats _))

  val oracle: Map[String, String] = Map(
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
