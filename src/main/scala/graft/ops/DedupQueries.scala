package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Gate queries for the near-dup family (MinHash+LSH, SimHash) with full
  * DuckDB oracle parity. Parameters are pinned here (the library API in
  * [[graft.operators.Dedup]] generalizes them).
  */
object DedupQueries {

  private[ops] val ShingleSize = 3
  private val NumHashes = 12
  private val Bands = 6 // → 2 rows/band, Jaccard capture threshold ≈ (1/6)^(1/2)

  /** MinHash + LSH candidate pairs, verified with exact shingle Jaccard. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(Tables.documents(spark, dir), "doc_id", "text",
      ShingleSize, NumHashes, Bands, threshold = 0.3)

  /** 16-bit SimHash signature + scale-out banding bucket per document. */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashSignatures(Tables.documents(spark, dir), "doc_id", "text")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_dedup_minhash_lsh" -> (minhashLsh _),
    "q28_dedup_simhash" -> (simhash _))

  // ---- oracle SQL (programmatically assembled to keep the 12-hash /
  // ---- 6-band structure in one place) ----

  private[ops] val toksSql = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"
  private[ops] val shinglesSql =
    s"""CASE WHEN len(tk) >= $ShingleSize
       | THEN list_transform(range(1, len(tk) - ${ShingleSize - 2}), i -> array_to_string(tk[i:i+${ShingleSize - 1}], ' '))
       | ELSE [array_to_string(tk, ' ')] END""".stripMargin

  // slice-derived hash family: salt i/4 picks the md5, slice i%4 picks 8 hex
  // chars — mirrors Dedup.minhash exactly
  private val sigCols = (0 until NumHashes)
    .map(i => s"min(substr(md5('${i / 4}:' || s), ${(i % 4) * 8 + 1}, 8)) AS h$i")
    .mkString(",\n    ")

  private val bandSelects = (0 until Bands).map { b =>
    val hs = (0 until NumHashes / Bands).map(r => s"h${b * (NumHashes / Bands) + r}")
    s"SELECT doc_id, $b AS band, md5(${hs.mkString(" || ")}) AS bkey FROM sig"
  }.mkString("\n  UNION ALL ")

  private val minhashOracle =
    s"""WITH toks AS (
       |  SELECT doc_id, $toksSql AS tk FROM documents
       |), sh AS (
       |  SELECT doc_id, $shinglesSql AS shingles FROM toks
       |), ex AS (
       |  SELECT doc_id, unnest(shingles) AS s FROM sh
       |), sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM ex GROUP BY doc_id
       |), bands AS (
       |  $bandSelects
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
       |    AND a.doc_id < b.doc_id
       |), sets AS (
       |  SELECT doc_id, list_distinct(list(s)) AS shset FROM ex GROUP BY doc_id
       |)
       |SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(x.shset, y.shset)) AS INTEGER) AS n_shared,
       |  CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
       |    / CAST(len(x.shset) + len(y.shset) - len(list_intersect(x.shset, y.shset)) AS DOUBLE) AS jaccard,
       |  (CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
       |    / CAST(len(x.shset) + len(y.shset) - len(list_intersect(x.shset, y.shset)) AS DOUBLE))
       |    >= CAST(0.3 AS DOUBLE) AS is_near_dup
       |FROM cand
       |JOIN sets x ON cand.doc_a = x.doc_id
       |JOIN sets y ON cand.doc_b = y.doc_id""".stripMargin

  private[ops] val voteCols = (1 to 16)
    .map(k => s"sum(CASE WHEN substr(md5(t), $k, 1) >= '8' THEN 1 ELSE -1 END) AS s$k")
    .mkString(",\n    ")
  private[ops] val bitSum = (1 to 16)
    .map(k => s"CASE WHEN s$k >= 0 THEN ${1 << (16 - k)} ELSE 0 END")
    .mkString(" + ")

  private val simhashOracle =
    s"""WITH ex AS (
       |  SELECT doc_id, unnest($toksSql) AS t FROM documents
       |), votes AS (
       |  SELECT doc_id,
       |    $voteCols
       |  FROM ex GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($bitSum AS INTEGER) AS simhash,
       |  CAST(($bitSum) // 256 AS INTEGER) AS bucket
       |FROM votes""".stripMargin

  val oracle: Map[String, String] = Map(
    "q27_dedup_minhash_lsh" -> minhashOracle,
    "q28_dedup_simhash" -> simhashOracle)
}
