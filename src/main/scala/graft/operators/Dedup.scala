package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Near-duplicate and exact-duplicate detection operators for document
  * corpora — the dedup family of a pretraining-data pipeline (exact,
  * MinHash+LSH, SimHash). Extension surface beyond the reference (SURVEY
  * §7.3); all pure Column expressions over builtins, so every stage is a
  * shuffle-on-key dataflow with no UDFs and no driver loops.
  *
  * Scale design: nothing here is O(n²) over the corpus. Candidate
  * generation goes through LSH band buckets (equi-join on band key), so
  * cost tracks the number of true near-duplicates, not pairs. Hash keys
  * (md5) shuffle uniformly — input skew cannot produce shuffle skew.
  */
object Dedup {

  /** Sliding word n-grams ("shingles") of the whitespace token stream.
    * Documents shorter than n tokens collapse to one whole-text shingle.
    * Runs through the codegen'd [[graft.functions.Native.WordShingles]]
    * (the HOF formulation below is kept as the readable reference; the two
    * are asserted identical in NativeSpec). */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.Native.shingles(text, n)

  /** Higher-order-function reference formulation of [[wordShingles]] —
    * same output, but the transform/slice/concat_ws lambdas are
    * interpreted per element (the reason the hot path is native). */
  def wordShinglesHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** One MinHash value: min over the (exploded) shingle column of an 8-hex
    * slice of a salted md5. Each 32-bit slice of an md5 is an independent
    * uniform hash, so one md5 call yields FOUR hash functions (salt =
    * i/4, slice = i%4) — 4× fewer digest computations than one-salt-per-
    * hash. Lexicographic min over fixed-length hex strings compares
    * byte-wise identically on any engine, and duplicate shingles are
    * harmless (min is idempotent — no distinct pass needed). */
  def minhash(shingle: Column, i: Int): Column =
    min(substring(md5(concat_ws(":", lit(i / 4), shingle)), (i % 4) * 8 + 1, 8))

  /** Per-document MinHash signatures: explode shingles → groupBy doc →
    * `numHashes` min-aggregates in one hash-agg pass (partial+final, so the
    * shuffle carries only `numHashes` short strings per doc). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int): DataFrame = {
    val exploded = docs.select(col(idCol),
      explode(wordShingles(col(textCol), shingleSize)).as("shingle"))
    exploded.groupBy(col(idCol))
      .agg(minhash(col("shingle"), 0).as("h0"),
        (1 until numHashes).map(i => minhash(col("shingle"), i).as(s"h$i")): _*)
  }

  /** LSH banding: split the signature into `bands` groups of `rowsPerBand`
    * hashes, key each band by the md5 of its concatenated hashes. Documents
    * sharing any band key are candidate near-duplicates. */
  def bandKeys(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(hs: _*)).as("bkey"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** Candidate pairs via band-bucket self-join (equi-join on (band, bkey) —
    * shuffles on the hash key, never compares across buckets), deduped and
    * ordered (a < b). */
  def candidatePairs(banded: DataFrame, idCol: String): DataFrame = {
    val a = banded.select(col(idCol).as("doc_a"), col("band"), col("bkey"))
    val b = banded.select(col(idCol).as("doc_b"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Verify candidate pairs with exact shingle-set Jaccard against a
    * precomputed `(idCol, shset)` set table. Integer set sizes divide
    * exactly, so the similarity is engine-deterministic. */
  def withJaccard(pairs: DataFrame, sets: DataFrame, idCol: String): DataFrame = {
    val sa = sets.select(col(idCol).as("doc_a"), col("shset").as("set_a"))
    val sb = sets.select(col(idCol).as("doc_b"), col("shset").as("set_b"))
    val inter = size(array_intersect(col("set_a"), col("set_b")))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        inter.as("n_shared"),
        (inter.cast("double") /
          (size(col("set_a")) + size(col("set_b")) - inter).cast("double"))
          .as("jaccard"))
  }

  /** Shingle-set table: one `(idCol, shset)` row per document. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame =
    docs.select(col(idCol),
      explode(wordShingles(col(textCol), shingleSize)).as("shingle"))
      .groupBy(col(idCol)).agg(collect_set(col("shingle")).as("shset"))

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band → bucket-join
    * → exact-Jaccard verify. Signatures AND shingle sets come out of ONE
    * explode+groupBy pass (cached: the result feeds the band join once and
    * the Jaccard verification twice), so the corpus is shingled exactly
    * once. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 12, bands: Int = 6,
      threshold: Double = 0.3): DataFrame = {
    val rows = numHashes / bands
    val exploded = docs.select(col(idCol),
      explode(wordShingles(col(textCol), shingleSize)).as("shingle"))
    val sigsAndSets = exploded.groupBy(col(idCol))
      .agg(collect_set(col("shingle")).as("shset"),
        (0 until numHashes).map(i => minhash(col("shingle"), i).as(s"h$i")): _*)
      .cache()
    val cands = candidatePairs(bandKeys(sigsAndSets, idCol, bands, rows), idCol)
    withJaccard(cands, sigsAndSets, idCol)
      .withColumn("is_near_dup", col("jaccard") >= lit(threshold))
  }

  /** 16-bit SimHash from the (multiset of) whitespace tokens: per bit k,
    * vote +1/-1 on the k-th md5 hex digit's top bit, take the sign of the
    * vote sum. Frequent tokens vote once per occurrence (classic
    * frequency-weighted SimHash). `bucket` (top byte) is the banding key
    * for a scale-out hamming-neighbor join. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val votes = exploded.groupBy(col(idCol)).agg(
      sum(when(substring(md5(col("tok")), 1, 1) >= "8", 1).otherwise(-1)).as("s1"),
      (2 to 16).map(k =>
        sum(when(substring(md5(col("tok")), k, 1) >= "8", 1).otherwise(-1)).as(s"s$k")): _*)
    val sim = (1 to 16).map(k =>
      when(col(s"s$k") >= 0, lit(1 << (16 - k))).otherwise(lit(0)))
      .reduce(_ + _)
    votes.select(col(idCol), sim.as("simhash"))
      .withColumn("bucket", expr("simhash div 256").cast("int"))
  }

  /** Exact dedup by content fingerprint (md5 of the raw text): keep the
    * lowest id per fingerprint (ref-style deterministic tie-break). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
