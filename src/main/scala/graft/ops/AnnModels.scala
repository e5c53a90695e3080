package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persistence for trained ANN model state — the driver-side artifacts a
  * 100 TB deployment trains ONCE and reuses across sessions: PCA/OPQ
  * rotations ([[Similarity.PcaModel]]), IVF coarse centroids, and PQ
  * codebooks. (The reference pipeline has no ANN at all — this is part
  * of the training-data-pipeline surface, not a port.)
  *
  * Contract: BIT-EXACT round trips. Every double travels as its raw
  * IEEE-754 bits in a LONG column (`doubleToRawLongBits`), so no
  * parquet/driver representation step can perturb a ULP — a reloaded
  * model retrieves byte-identical results, which is what makes
  * re-gating a query through a save/load cycle a meaningful test
  * (OpsSpec pins round trips with `==` on the raw bits; q90 gates the
  * loaded-model path against the DuckDB oracle at 3 SFs).
  *
  * Layout: ONE uniform parquet schema `(s, i, j, bits)` for all three
  * model kinds, written as a single file (models are control-plane
  * sized — d², nlist·d, m·ksub·subdim — never data-sized). The model
  * KIND rides as field metadata on `bits` (the [[Dedup.spanDedupIndex]]
  * k-stamp precedent: Spark persists field metadata through parquet),
  * and every loader REFUSES a missing or mismatched kind — loading a
  * codebooks file as centroids must fail loudly, not reshape silently.
  * Loaders also validate index contiguity and rectangularity, so a
  * truncated or hand-edited file fails at load, not at query time.
  */
object AnnModels {

  private val KindKey = "graft.ann.kind"
  private val KindPca = "pca-model"
  private val KindCentroids = "ivf-centroids"
  private val KindCodebooks = "pq-codebooks"

  private val schema = StructType(Seq(
    StructField("s", IntegerType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("bits", LongType, nullable = false)))

  private def write(spark: SparkSession, rows: Seq[Row], kind: String,
      dir: String): Unit = {
    val md = new MetadataBuilder().putString(KindKey, kind).build()
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .select(col("s"), col("i"), col("j"), col("bits").as("bits", md))
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  private def read(spark: SparkSession, dir: String,
      kind: String): Array[(Int, Int, Int, Long)] = {
    val df = spark.read.parquet(dir)
    require(df.columns.sameElements(Array("s", "i", "j", "bits")),
      s"$dir is not an AnnModels file: columns ${df.columns.mkString(",")}")
    val m = df.schema("bits").metadata
    require(m.contains(KindKey),
      s"$dir carries no ${KindKey} stamp — not written by AnnModels.save*")
    val found = m.getString(KindKey)
    require(found == kind,
      s"$dir holds a '$found' model; this loader expects '$kind'")
    df.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
  }

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
  private def dbl(l: Long): Double = java.lang.Double.longBitsToDouble(l)

  /** Rebuild a dense `n × len(i)` family of rows from (i, j, bits)
    * triples, validating contiguity and rectangularity.
    */
  private def rect(what: String,
      rows: Array[(Int, Int, Long)]): Array[Array[Double]] = {
    if (rows.isEmpty) return Array.empty
    val byI = rows.groupBy(_._1)
    val n = byI.keys.max + 1
    require(byI.size == n && byI.keys.min == 0,
      s"$what: row indexes not contiguous 0..${n - 1}")
    val width = byI(0).length
    Array.tabulate(n) { i =>
      val r = byI(i)
      require(r.length == width, s"$what: row $i has ${r.length} values, " +
        s"row 0 has $width — not rectangular")
      val js = r.map(_._2).sorted
      require(js.sameElements(0 until width),
        s"$what: row $i column indexes not contiguous 0..${width - 1}")
      val out = new Array[Double](width)
      r.foreach { case (_, j, b) => out(j) = dbl(b) }
      out
    }
  }

  // ---- PcaModel (sections: 0 = means, 1 = eigenvalues, 2 = components)

  def savePca(spark: SparkSession, model: Similarity.PcaModel,
      dir: String): Unit = {
    val rows =
      model.means.toSeq.zipWithIndex.map { case (v, j) =>
        Row(0, 0, j, bits(v)) } ++
      model.eigenvalues.toSeq.zipWithIndex.map { case (v, j) =>
        Row(1, 0, j, bits(v)) } ++
      model.components.toSeq.zipWithIndex.flatMap { case (row, i) =>
        row.toSeq.zipWithIndex.map { case (v, j) => Row(2, i, j, bits(v)) } }
    write(spark, rows, KindPca, dir)
  }

  def loadPca(spark: SparkSession, dir: String): Similarity.PcaModel = {
    val all = read(spark, dir, KindPca)
    def sect(s: Int) = all.filter(_._1 == s).map(t => (t._2, t._3, t._4))
    val means = rect("pca means", sect(0))
    val eig = rect("pca eigenvalues", sect(1))
    val comp = rect("pca components", sect(2))
    require(means.length <= 1 && eig.length <= 1,
      "pca means/eigenvalues must be single rows")
    val model = Similarity.PcaModel(
      means.headOption.getOrElse(Array.empty),
      comp,
      eig.headOption.getOrElse(Array.empty))
    require(model.components.forall(_.length == model.means.length),
      s"pca: component width ${model.components.headOption.fold(0)(_.length)} " +
        s"!= means dim ${model.means.length}")
    require(model.eigenvalues.length == model.components.length,
      s"pca: ${model.eigenvalues.length} eigenvalues for " +
        s"${model.components.length} components")
    model
  }

  // ---- IVF centroids ((cid, vector); s unused)

  /** Save contract (r18 review): cids must be contiguous `0..n-1` —
    * what [[Similarity.trainIvfCentroids]] produces — checked HERE so a
    * pruned/holey table fails at save, not as an unloadable file later.
    * [[loadCentroids]] returns the array in ASCENDING cid order
    * regardless of input order (cid is the identity; array position is
    * not part of the contract).
    */
  def saveCentroids(spark: SparkSession,
      centroids: Array[(Int, Array[Double])], dir: String): Unit = {
    val cids = centroids.map(_._1).sorted
    require(cids.sameElements(centroids.indices),
      s"centroid ids must be contiguous 0..${centroids.length - 1} " +
        s"(the trainer's output shape); got ${cids.take(8).mkString(",")}" +
        (if (cids.length > 8) ",…" else ""))
    val rows = centroids.toSeq.flatMap { case (cid, v) =>
      v.zipWithIndex.map { case (x, j) => Row(0, cid, j, bits(x)) } }
    write(spark, rows, KindCentroids, dir)
  }

  def loadCentroids(spark: SparkSession,
      dir: String): Array[(Int, Array[Double])] = {
    val all = read(spark, dir, KindCentroids)
    rect("ivf centroids", all.map(t => (t._2, t._3, t._4))).zipWithIndex
      .map { case (v, cid) => (cid, v) }
  }

  // ---- PQ codebooks (s = subspace, i = code id, j = component)

  def saveCodebooks(spark: SparkSession,
      codebooks: Array[Array[Array[Double]]], dir: String): Unit = {
    val rows = codebooks.toSeq.zipWithIndex.flatMap { case (book, s) =>
      book.toSeq.zipWithIndex.flatMap { case (cent, i) =>
        cent.toSeq.zipWithIndex.map { case (x, j) => Row(s, i, j, bits(x)) } } }
    write(spark, rows, KindCodebooks, dir)
  }

  def loadCodebooks(spark: SparkSession,
      dir: String): Array[Array[Array[Double]]] = {
    val all = read(spark, dir, KindCodebooks)
    if (all.isEmpty) return Array.empty
    val bySub = all.groupBy(_._1)
    val m = bySub.keys.max + 1
    require(bySub.size == m && bySub.keys.min == 0,
      s"pq codebooks: subspace indexes not contiguous 0..${m - 1}")
    val books = Array.tabulate(m) { s =>
      rect(s"pq codebook $s", bySub(s).map(t => (t._2, t._3, t._4)))
    }
    require(books.forall(_.length == books(0).length),
      "pq codebooks: subspaces have different ksub")
    books
  }

  // ---- OPQ bundle (rotation/ + codebooks/ subdirectories — what
  // trainOpq returns: the balanced rotation model and the rotated-space
  // PQ codebooks)

  def saveOpq(spark: SparkSession, rotation: Similarity.PcaModel,
      codebooks: Array[Array[Array[Double]]], dir: String): Unit = {
    savePca(spark, rotation, s"$dir/rotation")
    saveCodebooks(spark, codebooks, s"$dir/codebooks")
  }

  def loadOpq(spark: SparkSession, dir: String)
      : (Similarity.PcaModel, Array[Array[Array[Double]]]) =
    (loadPca(spark, s"$dir/rotation"),
      loadCodebooks(spark, s"$dir/codebooks"))

  // ---- IVF-PQ bundle (centroids/ + codebooks/ subdirectories)

  def saveIvfPq(spark: SparkSession,
      centroids: Array[(Int, Array[Double])],
      codebooks: Array[Array[Array[Double]]], dir: String): Unit = {
    saveCentroids(spark, centroids, s"$dir/centroids")
    saveCodebooks(spark, codebooks, s"$dir/codebooks")
  }

  def loadIvfPq(spark: SparkSession, dir: String)
      : (Array[(Int, Array[Double])], Array[Array[Array[Double]]]) =
    (loadCentroids(spark, s"$dir/centroids"),
      loadCodebooks(spark, s"$dir/codebooks"))
}
