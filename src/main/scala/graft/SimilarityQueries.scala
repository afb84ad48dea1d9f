package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Tables
import graft.ext.{DocFixtures, MinHashLSH, Multimodal, SimHash, Similarity}

/** Similarity search (s*), sketch-based near-dup (d3/d4/d5) and multimodal
  * (m*) driver queries. The hash-sketch operators (MinHash band keys,
  * SimHash fingerprints) build on Spark's xxhash64, which DuckDB cannot
  * replicate, so those entries have no oracleSql — the driver records the
  * weaker rows-only check and the ScalaTest suite carries the semantics
  * (candidate recall vs. the exact-Jaccard d2 oracle query, ANN recall vs.
  * brute force).
  */
object SimilarityQueries {

  private val dim = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — similarity search —
    "s1_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(
        Tables.table(s, dir, "embeddings"), queryId = 0L, k = 10)),
    "s2_ann_lsh_topk" -> ((s, dir) =>
      Similarity.annTopK(Tables.table(s, dir, "embeddings"),
        queryId = 0L, k = 10, numPlanes = 4, dim = dim)),
    "s3_knn_join" -> ((s, dir) =>
      Similarity.knnJoinExact(Tables.table(s, dir, "embeddings"), k = 3)
        .orderBy("id1", "id2")),

    // — sketch near-dup —
    "d3_minhash_lsh" -> ((s, dir) =>
      MinHashLSH.nearDupPairs(DocFixtures.docsNear(s, dir))
        .orderBy("id1", "id2")),
    "d4_simhash" -> ((s, dir) =>
      SimHash.nearDupPairs(DocFixtures.docsNear(s, dir))
        .orderBy("id1", "id2")),
    "d5_embedding_dup" -> ((s, dir) =>
      Similarity.embeddingDupPairs(DocFixtures.embDup(s, dir),
        threshold = 0.999, numPlanes = 12, dim = dim)
        .orderBy("id1", "id2")),

    // — multimodal —
    "m1_media_meta" -> ((s, dir) =>
      Multimodal.asMedia(DocFixtures.docs(s, dir))
        .select(col("doc_id"), length(col("blob")).cast("long").as("n_bytes"),
          // Spark's base64 MIME-chunks with CRLF every 76 chars; strip to
          // match the oracle's unchunked encoding.
          regexp_replace(base64(col("blob")), "\r\n", "").as("b64"))
        .orderBy("doc_id")),
    "m2_media_decode" -> ((s, dir) =>
      Multimodal.decode(Multimodal.asMedia(DocFixtures.docs(s, dir)))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("mean_byte"))
        .orderBy("doc_id")),
    "m3_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(DocFixtures.docs(s, dir),
        frameLen = 32, stride = 16, maxFrames = 8)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).cast("long").as("n_bytes"),
          regexp_replace(base64(col("frame")), "\r\n", "").as("b64"))
        .orderBy("doc_id", "frame_idx")),

    // — vector aggregation: per-label centroid as exploded (label, pos,
    //   value) rows. Plain avg() over doubles is partition-order dependent;
    //   for cross-engine determinism each component is summed by a left
    //   fold in vec_id order (Spark `aggregate` ≡ DuckDB `list_reduce`),
    //   then divided by the count. The production swap-in is avg() — same
    //   single shuffle on (label, pos), no collect_list — when bit parity
    //   with another engine is not required.
    "v1_label_centroids" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
      e.select(col("label"), col("vec_id"),
        posexplode(graft.functions.VectorOps.toDouble(col("embedding")))
          .as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(collect_list(struct(col("vec_id"), col("x"))).as("vals"),
          count(lit(1)).as("n_vectors"))
        .select(col("label"), col("pos").cast("long").as("pos"),
          (aggregate(transform(array_sort(col("vals")), p => p.getField("x")),
            lit(0.0), (a, x) => a + x) / col("n_vectors")).as("value"),
          col("n_vectors"))
        .orderBy("label", "pos")
    }))

  /** Left-fold dot product, mirrored against Spark's
    * `aggregate(zip_with(...))` — `list_reduce` folds left-to-right like
    * Spark's `aggregate`, keeping the doubles bit-identical.
    */
  private def duckDot(a: String, b: String) =
    s"list_reduce(list_transform(range(len($a)), i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)), (x, y) -> x + y)"

  val oracles: Map[String, String] = Map(
    "s1_cosine_topk" -> Oracle.sqlWith(
      "q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)",
      s"""SELECT e.vec_id,
         |       ${duckDot("e.embedding", "q.qv")}
         |         / (sqrt(${duckDot("e.embedding", "e.embedding")})
         |            * sqrt(${duckDot("q.qv", "q.qv")})) AS cosine
         |FROM embeddings e, q
         |WHERE e.vec_id != 0
         |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin),
    "s3_knn_join" -> Oracle.sqlWith(
      s"""v AS (SELECT vec_id, embedding,
         |           sqrt(${duckDot("embedding", "embedding")}) AS nrm
         |      FROM embeddings),
         |knn_pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |                     ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
         |              FROM v a JOIN v b ON a.vec_id != b.vec_id)""".stripMargin,
      """SELECT id1, id2, cosine
        |FROM (SELECT id1, id2, cosine,
        |             ROW_NUMBER() OVER (PARTITION BY id1 ORDER BY cosine DESC, id2) AS rn
        |      FROM knn_pairs)
        |WHERE rn <= 3 ORDER BY id1, id2""".stripMargin),
    "m1_media_meta" -> Oracle.sql(
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       to_base64(encode(text)) AS b64
        |FROM documents ORDER BY doc_id""".stripMargin),
    "v1_label_centroids" -> Oracle.sqlWith(
      """expl AS (SELECT label, vec_id, embedding,
        |                unnest(range(len(embedding))) AS pos
        |         FROM embeddings),
        |cent AS (SELECT label, pos,
        |                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |                  list(CAST(embedding[CAST(pos AS INTEGER) + 1] AS DOUBLE)
        |                       ORDER BY vec_id)),
        |                  (a, b) -> a + b) AS s,
        |                COUNT(*) AS n_vectors
        |         FROM expl GROUP BY label, pos)""".stripMargin,
      """SELECT label, CAST(pos AS BIGINT) AS pos, s / n_vectors AS value,
        |       n_vectors
        |FROM cent ORDER BY label, pos""".stripMargin),
    "m3_frame_sample" -> Oracle.sql(
      """SELECT doc_id, k AS frame_idx,
        |       CAST(octet_length(encode(fs)) AS BIGINT) AS n_bytes,
        |       to_base64(encode(fs)) AS b64
        |FROM (SELECT doc_id, k,
        |             substring(text, CAST(k * 16 + 1 AS INTEGER), 32) AS fs
        |      FROM (SELECT doc_id, text,
        |                   unnest(range(GREATEST(LEAST(CAST(floor((length(text) - 32) / 16.0) AS BIGINT) + 1, 8), 1))) AS k
        |            FROM documents))
        |ORDER BY doc_id, frame_idx""".stripMargin))
}
