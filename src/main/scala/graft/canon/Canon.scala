package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Ckpt._

/** Canonicalization — alias merging beyond exact keys (north rule; the
  * reference only collapses EXACT canonical keys via MERGE, utils.rs:82-136,
  * so this stage GENERALIZES its F1/F2 identity semantics — SURVEY.md §2.F):
  *
  *   character-3-gram shingles -> MinHash signatures -> LSH band buckets ->
  *   candidate pairs -> exact-Jaccard scoring -> iterative-DataFrame
  *   connected components -> cluster labels.
  *
  * Portability trick: MinHash seed-i of a shingle set is
  * `min(md5(i || ':' || shingle))` — min over hex STRINGS. md5 is identical
  * everywhere, string min is byte order, so signatures are reproducible in
  * the DuckDB oracle with zero numeric-hash drift. At scale the min-
  * aggregation is a partial (map-side) aggregate and LSH banding turns the
  * quadratic all-pairs problem into an equi-join on band keys; candidate
  * scoring joins only within buckets.
  */
object Canon {

  val K = 8 // minhash signature length
  val BANDS = 4 // 4 bands x 2 rows

  /** (name) -> (name, shingle): distinct lowercase character 3-grams. */
  def shingles(names: DataFrame): DataFrame =
    names
      .select(col("name"), lower(col("name")).as("lname"))
      .where(length(col("lname")) >= 3)
      .select(
        col("name"),
        explode(
          expr("transform(sequence(1, length(lname) - 2), i -> substr(lname, i, 3))")
        ).as("shingle")
      )
      .distinct()

  /** MinHash signature: K md5-min columns -> BANDS band keys. Output:
    * (name, band_idx, band_key).
    */
  def bands(sh: DataFrame): DataFrame = {
    val aggs = (0 until K).map(i =>
      min(md5(concat(lit(i.toString), lit(":"), col("shingle")).cast("binary"))).as(s"h$i")
    )
    val mins = sh.groupBy("name").agg(aggs.head, aggs.tail: _*)
    val rowsPerBand = K / BANDS
    val bandCols = (0 until BANDS).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band_idx"), concat_ws("|", parts: _*).as("band_key"))
    }
    mins
      .select(col("name"), explode(array(bandCols: _*)).as("bk"))
      .select(col("name"), col("bk.band_idx"), col("bk.band_key"))
  }

  /** LSH-blocked candidate pairs with exact Jaccard >= `minJaccard`.
    * Pairs ordered name_a < name_b; Jaccard from distinct-shingle counts.
    */
  def candidatePairs(names: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    // cached for its 3 consumers (bands, sizes, intersection join), then
    // RELEASED before returning: the round-2 bench leaked one shingle cache
    // per invocation across the 68-query loop, and the accumulated blocks
    // drove the shared-heap GC residency behind the 37–244 s build spread.
    // The returned pair set (above-threshold only) is eagerly materialized
    // so unpersisting the input cannot trigger recomputation.
    val sh = shingles(names).cache()
    val b = bands(sh)
    val cand = b
      .as("x")
      .join(b.as("y"), Seq("band_idx", "band_key"))
      .where(col("x.name") < col("y.name"))
      .select(col("x.name").as("name_a"), col("y.name").as("name_b"))
      .distinct()
    val sizes = sh.groupBy("name").agg(count(lit(1)).as("n"))
    val shA = sh.select(col("name").as("name_a"), col("shingle"))
    val shB = sh.select(col("name").as("name_b"), col("shingle"))
    val inter = cand
      .join(shA, Seq("name_a"))
      .join(shB, Seq("name_b", "shingle"))
      .groupBy("name_a", "name_b")
      .agg(count(lit(1)).as("inter"))
    val pairs = cand
      .join(inter, Seq("name_a", "name_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.withColumnRenamed("name", "name_a").withColumnRenamed("n", "na"), Seq("name_a"))
      .join(sizes.withColumnRenamed("name", "name_b").withColumnRenamed("n", "nb"), Seq("name_b"))
      .withColumn(
        "jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double")
      )
      .where(col("jaccard") >= minJaccard)
      .select("name_a", "name_b", "jaccard")
      .lcp()
    sh.unpersist()
    pairs
  }

  /** UTF-8 byte order — the SAME total order Spark's UTF8String binary
    * comparisons (min("cluster"), col(a) < col(b)) use. Java String
    * compareTo orders by UTF-16 code UNITS, which disagrees with code-point
    * order for supplementary-plane characters (surrogates 0xD800+ sort below
    * BMP chars >= 0xE000), so a driver path using compareTo could pick a
    * different component root than the distributed twin. All driver-side
    * min-root selections go through this comparator.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    java.util.Arrays.compareUnsigned(x, y) < 0
  }

  /** Per-bucket candidate budget for the driver-local [[clusters]] path: an
    * LSH bucket of m names yields m(m-1)/2 driver-heap pairs, so a skewed
    * bucket (many near-identical names) is quadratic where the distributed
    * twin's bucket self-join would spill. [[DriverCcMaxVertices]] was
    * calibrated for union-find over already-thresholded pairs; the full LSH
    * path gets this tighter pair budget instead — exceeded, it falls back to
    * the distributed pipeline (identical semantics).
    */
  val DriverMaxCandidatePairs: Long = 2L << 20

  /** End-to-end size-adaptive clustering: semantically IDENTICAL to
    * `connectedComponents(names, candidatePairs(names, minJaccard))` — same
    * shingles, same md5-hex-string MinHash, same band buckets, same exact-
    * Jaccard gate, same min-name components (CanonSpec asserts equality
    * against the distributed twin). Under [[DriverCcMaxVertices]] the whole
    * computation runs on the driver from ONE collect of the name dimension:
    * the LSH pipeline is ~6 Spark jobs whose fixed overhead dwarfs the work
    * when the dimension is dictionary-bounded (the common case — it exists
    * to merge aliases of a known vocabulary). Above the ceiling the
    * distributed pipeline runs unchanged.
    */
  def clusters(names: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    val spark = names.sparkSession
    val n = names.count() // dimension-sized; callers pass a checkpointed frame
    if (n > DriverCcMaxVertices)
      return connectedComponentsLoop(names, candidatePairs(names, minJaccard))
    import spark.implicits._
    val nm = names.select("name").collect().map(_.getString(0))
    def md5hex(s: String): String =
      java.security.MessageDigest
        .getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_))
        .mkString
    def shinglesOf(x: String): Set[String] = {
      val l = x.toLowerCase
      if (l.length < 3) Set.empty
      else (0 to l.length - 3).map(i => l.substring(i, i + 3)).toSet
    }
    val sh = nm.map(x => x -> shinglesOf(x)).toMap
    val rowsPerBand = K / BANDS
    val buckets =
      scala.collection.mutable.HashMap.empty[(Int, String), scala.collection.mutable.ListBuffer[String]]
    nm.foreach { x =>
      val s = sh(x)
      if (s.nonEmpty) { // <3-char names have no shingles, hence no bands
        val hs = (0 until K).map(i => s.map(g => md5hex(s"$i:$g")).min)
        (0 until BANDS).foreach { b =>
          val key = (b, (0 until rowsPerBand).map(r => hs(b * rowsPerBand + r)).mkString("|"))
          buckets.getOrElseUpdate(key, scala.collection.mutable.ListBuffer.empty) += x
        }
      }
    }
    // pair budget BEFORE materializing: a skewed bucket (or many medium
    // ones) would otherwise build O(m^2) pairs on the driver heap — past the
    // budget the distributed pipeline (which spills its bucket self-join)
    // runs instead, semantics unchanged
    val pairBound = buckets.values.iterator.map { xs =>
      val m = xs.distinct.size.toLong; m * (m - 1) / 2
    }.sum
    if (pairBound > DriverMaxCandidatePairs)
      return connectedComponentsLoop(names, candidatePairs(names, minJaccard))
    val cand = scala.collection.mutable.HashSet.empty[(String, String)]
    buckets.values.foreach { xs =>
      val arr = xs.distinct.sorted
      var i = 0
      while (i < arr.length) {
        var j = i + 1
        while (j < arr.length) { cand += ((arr(i), arr(j))); j += 1 }
        i += 1
      }
    }
    val parent = scala.collection.mutable.HashMap.from(nm.map(x => x -> x))
    @annotation.tailrec
    def find(x: String): String =
      if (parent(x) == x) x else { parent(x) = parent(parent(x)); find(parent(x)) }
    cand.foreach { case (a, b) =>
      val (sa, sb) = (sh(a), sh(b))
      val inter = (sa & sb).size
      val uni = sa.size + sb.size - inter
      if (uni > 0 && inter.toDouble / uni >= minJaccard) {
        val (ra, rb) = (find(a), find(b))
        if (utf8Lt(ra, rb)) parent(rb) = ra else if (utf8Lt(rb, ra)) parent(ra) = rb
      }
    }
    nm.toSeq.map(x => (x, find(x))).toDF("name", "cluster")
  }

  /** Vertex-count ceiling for the driver-local union-find fast path of
    * [[connectedComponents]]. The canonical-name dimension is bounded by the
    * dictionary (it exists to merge aliases of a known entity vocabulary),
    * so in practice it is broadcast-scale; below this ceiling the iterative
    * DataFrame loop's fixed per-iteration cost (joins + checkpoint + a
    * convergence count, x ~3-5 iterations ≈ seconds) dwarfs a <100 ms
    * driver union-find over the collected pairs. Above it, the distributed
    * loop runs — correctness is identical (same min-label semantics), only
    * the execution site adapts to the measured dimension size, like AQE
    * picking a broadcast join under a size threshold.
    */
  val DriverCcMaxVertices: Long = 100000L

  /** Connected components over the candidate-pair graph: cluster = min name
    * in the component. Size-adaptive: driver union-find under
    * [[DriverCcMaxVertices]] vertices, iterative-DataFrame smallest-label
    * propagation (north rule; SURVEY.md §7.5 item 3) above it.
    */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = vertices.sparkSession
    val n = vertices.count() // dimension-sized; callers pass a checkpointed frame
    if (n <= DriverCcMaxVertices) {
      import spark.implicits._
      val names = vertices.select("name").collect().map(_.getString(0))
      val prs = pairs.select("name_a", "name_b").collect()
      val parent = scala.collection.mutable.HashMap.from(names.map(x => x -> x))
      @annotation.tailrec
      def find(x: String): String =
        if (parent(x) == x) x else { parent(x) = parent(parent(x)); find(parent(x)) }
      prs.foreach { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        if (parent.contains(a) && parent.contains(b)) {
          val (ra, rb) = (find(a), find(b))
          // always hang the LARGER root under the smaller (UTF-8 byte
          // order, matching Spark's UTF8String comparisons), so the final
          // root of every component IS its min name — the exact fixpoint
          // the distributed loop converges to
          if (utf8Lt(ra, rb)) parent(rb) = ra else if (utf8Lt(rb, ra)) parent(ra) = rb
        }
      }
      names.toSeq.map(x => (x, find(x))).toDF("name", "cluster")
    } else connectedComponentsLoop(vertices, pairs, maxIter)
  }

  /** The distributed path: smallest-label propagation over undirected pair
    * edges until fixpoint, localCheckpoint per iteration.
    */
  def connectedComponentsLoop(
      vertices: DataFrame,
      pairs: DataFrame,
      maxIter: Int = 50
  ): DataFrame = {
    val bi = pairs
      .select(col("name_a").as("src"), col("name_b").as("dst"))
      .unionByName(pairs.select(col("name_b").as("src"), col("name_a").as("dst")))
      .cache()
    var labels = vertices.select(col("name"), col("name").as("cluster")).lcp()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val msgs = labels
        .join(bi, labels("name") === bi("src"))
        .groupBy(col("dst").as("name"))
        .agg(min("cluster").as("nbr_min"))
      val next = labels
        .join(msgs, Seq("name"), "left")
        .withColumn("new_cluster", least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))))
        .select(col("name"), col("new_cluster").as("cluster"), col("cluster").as("old"))
        .lcp()
      changed = next.where(col("cluster") =!= col("old")).count()
      labels = next.select("name", "cluster")
      it += 1
    }
    bi.unpersist()
    labels
  }
}
