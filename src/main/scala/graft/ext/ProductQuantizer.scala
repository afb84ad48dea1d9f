package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Product quantization (Jégou et al., "Product quantization for nearest
  * neighbor search", TPAMI'11 — the PQ refinement stage [[IVFIndex]]'s
  * scaladoc promises): the vector space is split into `m` orthogonal
  * subspaces, each quantized by its own small seeded k-means codebook, so
  * a dim-d float vector compresses to `m` sub-byte codes (here 8×4 bits =
  * 4 bytes against 256 raw bytes, 64×) while distances remain computable
  * from code-indexed lookup tables (ADC) without touching the raw vectors.
  *
  * Scale notes: training runs once over a hash-capped sample (the
  * [[IVFIndex.build]] discipline — layout-independent, seeded,
  * deterministic); encoding is a narrow argmin pass over m×k broadcast
  * centroid literals inside codegen — no UDF, no ML runtime on the scan
  * path, no shuffle. At 100 TB the codes column (4 bytes/vector) is what
  * an ANN service keeps hot; IVF cells partition it, and ADC scans decode
  * nothing.
  */
object ProductQuantizer {

  /** codebooks(i) = subspace i's k centroids as (code, centroid). */
  case class PQ(codebooks: Array[Array[(Int, Array[Double])]]) {
    def m: Int = codebooks.length
    def subDim: Int = codebooks.head.head._2.length
  }

  /** Train m codebooks of k centroids each over (a capped sample of) the
    * corpus. Requires dim % m == 0. Seeded per subspace → deterministic.
    */
  def train(emb: DataFrame, m: Int, k: Int, seed: Long = 42L,
      maxTrain: Int = 100000): PQ = {
    val vecs = emb.select(col("vec_id"),
        VectorOps.toDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = vecs.count()
    val keepEvery = math.max(1L, n / maxTrain)
    val train = vecs
      .filter(pmod(xxhash64(col("vec_id")), lit(keepEvery)) === 0)
    val dim = train.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val books = (0 until m).map { i =>
      val features = train
        .select(array_to_vector(slice(col("v"), i * sub + 1, sub))
          .as("features"))
      val model = new KMeans().setK(k).setSeed(seed + i).setMaxIter(10)
        .fit(features)
      model.clusterCenters.zipWithIndex.map { case (c, j) => (j, c.toArray) }
    }.toArray
    vecs.unpersist()
    PQ(books)
  }

  /** Per-vector code array: subspace i's nearest-centroid index. One
    * narrow pass, broadcast centroid literals, argmin via least(struct) —
    * the [[IVFIndex.assignCells]] pattern per subspace.
    */
  def encode(emb: DataFrame, pq: PQ): DataFrame = {
    val v = VectorOps.toDouble(col("embedding"))
    val codes = pq.codebooks.zipWithIndex.map { case (book, i) =>
      val sv = slice(v, i * pq.subDim + 1, pq.subDim)
      least(book.map { case (j, c) =>
        struct(VectorOps.l2sq(sv, typedlit(c.toSeq)).as("d"),
          lit(j).as("code"))
      }.toIndexedSeq: _*).getField("code").cast("long")
    }
    emb.select(col("vec_id"), array(codes.toIndexedSeq: _*).as("codes"))
  }

  /** Driver-side decode (test/debug aid): concatenate each code's
    * centroid back into an approximate vector.
    */
  def decode(pq: PQ, codes: Seq[Long]): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, i) =>
      pq.codebooks(i)(c.toInt)._2
    }.toArray
}
