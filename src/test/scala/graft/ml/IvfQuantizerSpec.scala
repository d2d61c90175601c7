package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

class IvfQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val iters = 2

  private def corpus(n: Int, seed: Int): DataFrame = {
    val rng = new Random(seed)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.fill(4)(rng.nextFloat() * 2f - 1f))
    }
    rows.toDF("vec_id", "embedding")
      .withColumn("n2", graft.ops.Vectors.norm2Exact(col("embedding")))
  }

  private def collectRanked(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("vec_id").cast("long"), col("cell").cast("long"), col("cell_rank"))
      .as[(Long, Long, Long)].collect().toSet

  test("sampled fit still assigns the FULL corpus, with sample-seed cell labels") {
    val e = corpus(40, seed = 11)
    val ranked = IvfQuantizer.fitRanked(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2)
    val rows = collectRanked(ranked)
    graft.ops.Caches.releaseAll()
    // every corpus vector (sampled or not) gets a full k-cell ranking
    assert(rows.map(_._1) == (0L until 40L).toSet)
    assert(rows.size == 40 * k)
    // cells are labelled by their seed vector ids: the k lowest SAMPLE ids
    val seedIds = (0 until k).map(i => i.toLong * 2).toSet
    assert(rows.map(_._2) == seedIds)
    // rank 1 is a function: one assignment per vector
    assert(rows.count(_._3 == 1L) == 40)
  }

  test("sampleEvery=s fit == full fit on the manually filtered sample") {
    val e = corpus(40, seed = 23)
    val sampled = collectRanked(
      IvfQuantizer.fitRanked(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2))
    graft.ops.Caches.releaseAll()
    // fitting the even-id sub-corpus (ids re-densified: i → i/2, so the
    // dense-id seed formula picks the SAME k seed vectors) with
    // sampleEvery=1 must produce the same centroids (same seeds, same Lloyd
    // passes), hence the same ranking on the vectors both runs share —
    // modulo the id/cell-label remap
    val manual = collectRanked(
      IvfQuantizer.fitRanked(
        e.filter(col("vec_id") % 2 === 0).withColumn("vec_id", col("vec_id") / 2),
        "vec_id", "embedding", "n2", k, iters))
    graft.ops.Caches.releaseAll()
    val sampledRemapped = sampled.collect {
      case (id, cell, rank) if id % 2 == 0 => (id / 2, cell / 2, rank)
    }
    assert(sampledRemapped == manual)
  }

  test("sampled fit is deterministic across runs") {
    val e = corpus(30, seed = 37)
    val r1 = collectRanked(
      IvfQuantizer.fitRanked(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 3))
    graft.ops.Caches.releaseAll()
    val r2 = collectRanked(
      IvfQuantizer.fitRanked(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 3))
    graft.ops.Caches.releaseAll()
    assert(r1 == r2)
  }

  test("fitCentroids + routeVector reproduce fitAssign's assignment bit-for-bit") {
    // the batch/stream split contract: routing a corpus through the
    // exported centroid table with the closure-side exact arithmetic
    // (ExactDot.computeArrays + ascending-cell strict-> tie-break) must
    // equal the in-plan rankCells argmax — this pin is what lets
    // semanticDedupStream claim batch-identical cell routing
    val e = corpus(60, seed = 41)
    val batch = IvfQuantizer
      .fitAssign(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2)
      .select(col("vec_id").cast("long"), col("cell").cast("long"))
      .as[(Long, Long)].collect().toMap
    val cents = IvfQuantizer.collectCentroids(
      IvfQuantizer.fitCentroids(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2))
    graft.ops.Caches.releaseAll()
    assert(cents.map(_._1).toSeq == cents.map(_._1).toSeq.sorted && cents.length == k)
    val routed = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, vf) =>
        val v = vf.map(_.toDouble)
        val n2: Double = graft.functions.ExactDot.computeArrays(v, v, 9)
        id -> IvfQuantizer.routeVector(v, n2, cents)
      }.toMap
    assert(routed == batch,
      s"closure routing diverged from the in-plan assignment for ids " +
        s"${routed.collect { case (id, c) if batch(id) != c => id }.toSeq.sorted}")
  }

  test("fitCollect + fitRankedFrom == fitRanked bit-for-bit (flat, grouped, scored, hier)") {
    // the memoization contract SimilarityQ's per-dataset fit cache rests
    // on: serving the final full-corpus assignment from the collected
    // centroid table must be indistinguishable from the inline fit — same
    // ranking, same rank-1 assignment, same winning cosine, both flat and
    // grouped/hierarchical
    val e = corpus(60, seed = 53)
    val inline = collectRanked(
      IvfQuantizer.fitRanked(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2))
    graft.ops.Caches.releaseAll()
    val fit = IvfQuantizer.fitCollect(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2)
    graft.ops.Caches.releaseAll()
    val served = collectRanked(
      IvfQuantizer.fitRankedFrom(e, "vec_id", "embedding", "n2", fit))
    assert(served == inline, "memoized flat ranking diverged from the inline fit")

    val scoredInline = IvfQuantizer
      .fitAssignScored(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2)
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("cos_centroid"))
      .as[(Long, Long, Double)].collect().toSet
    graft.ops.Caches.releaseAll()
    val scoredServed = IvfQuantizer
      .fitAssignScoredFrom(e, "vec_id", "embedding", "n2", fit)
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("cos_centroid"))
      .as[(Long, Long, Double)].collect().toSet
    assert(scoredServed == scoredInline, "memoized scored assignment diverged")

    // grouped (the PQ-subspace shape): two groups over the same ids
    val eg = e.withColumn("sub", (col("vec_id") % 2).cast("int"))
    val gInline = IvfQuantizer
      .fitAssign(eg, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2,
        grpCols = Seq("sub"))
      .select(col("sub").cast("long"), col("vec_id").cast("long"), col("cell").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    graft.ops.Caches.releaseAll()
    val gFit = IvfQuantizer.fitCollect(eg, "vec_id", "embedding", "n2", k, iters,
      sampleEvery = 2, grpCols = Seq("sub"))
    graft.ops.Caches.releaseAll()
    val gServed = IvfQuantizer.fitAssignFrom(eg, "vec_id", "embedding", "n2", gFit)
      .select(col("sub").cast("long"), col("vec_id").cast("long"), col("cell").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(gServed == gInline, "memoized grouped assignment diverged")

    // hierarchical: two-level fit served from the collected pair
    val hInline = IvfQuantizer
      .fitAssignHier(e, "vec_id", "embedding", "n2", k, 1, se1 = 2, se2 = 1)
      .select(col("vec_id").cast("long"), col("ccell").cast("long"), col("scell").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    graft.ops.Caches.releaseAll()
    val (cFit, sFit) = IvfQuantizer.fitHierCollect(e, "vec_id", "embedding", "n2", k, 1, 2, 1)
    graft.ops.Caches.releaseAll()
    val hServed = IvfQuantizer.fitAssignHierFrom(e, "vec_id", "embedding", "n2", cFit, sFit)
      .select(col("vec_id").cast("long"), col("ccell").cast("long"), col("scell").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(hServed == hInline, "memoized hierarchical assignment diverged")
  }

  test("IVF routing recall: on clustered data every exact neighbor is in a probed cell") {
    // 8 well-separated clusters of 25 vectors in 16 dims: exact cosine
    // top-3 of any vector is inside its own cluster, so nprobe=2 routing
    // must place all of them in the query's probed cells — the quality
    // property (not just determinism) the sim_ivfpq composition rests on.
    // Deterministic jitter → a fixed outcome, not a flaky bound.
    val nClusters = 8; val perC = 25; val dims = 16
    val rows = (0 until nClusters).flatMap { c =>
      (0 until perC).map { j =>
        val id = (c * perC + j).toLong
        val v = Array.tabulate(dims) { d =>
          val base = if (d == 2 * c) 10f else if (d == 2 * c + 1) 5f else 0f
          base + (((id * 31 + d * 7) % 11).toFloat - 5f) / 10f
        }
        (id, v)
      }
    }
    val e = rows.toDF("vec_id", "embedding")
      .withColumn("n2", graft.ops.Vectors.norm2Exact(col("embedding")))
    val ranked = IvfQuantizer.fitRanked(e, "vec_id", "embedding", "n2", 8, 2, sampleEvery = 2)
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("cell_rank"))
      .as[(Long, Long, Long)].collect()
    graft.ops.Caches.releaseAll()
    val cellOf = ranked.filter(_._3 == 1L).map(r => r._1 -> r._2).toMap
    val probed = ranked.filter(r => r._3 <= 2L).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val byId = rows.toMap
    val queries = (0 until nClusters).map(c => (c * perC).toLong)
    val missed = queries.flatMap { q =>
      val top3 = rows.filter(_._1 != q)
        .sortBy { case (id, v) => (-cos(byId(q), v), id) }.take(3).map(_._1)
      top3.filterNot(n => probed(q).contains(cellOf(n)))
    }
    assert(missed.isEmpty, s"neighbors outside probed cells: $missed")
  }

  test("fitAssignScored: same assignment as fitAssign, cosine is the cell-wise max, deterministic") {
    val e = corpus(60, seed = 47)
    val plain = IvfQuantizer
      .fitAssign(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2)
      .select(col("vec_id").cast("long"), col("cell").cast("long"))
      .as[(Long, Long)].collect().toMap
    graft.ops.Caches.releaseAll()
    val scored = IvfQuantizer
      .fitAssignScored(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2)
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("cos_centroid"))
      .as[(Long, Long, Double)].collect()
    graft.ops.Caches.releaseAll()
    assert(scored.map(r => r._1 -> r._2).toMap == plain)
    assert(scored.forall(r => r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9))
    // the winning cosine dominates the vector's cosine to EVERY centroid
    // (it is the argmax the assignment ranked on)
    val cents = IvfQuantizer.collectCentroids(
      IvfQuantizer.fitCentroids(e, "vec_id", "embedding", "n2", k, iters, sampleEvery = 2))
    graft.ops.Caches.releaseAll()
    val vecs = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    for ((id, _, cosWin) <- scored) {
      val v = vecs(id).map(_.toDouble)
      val n2: Double = graft.functions.ExactDot.computeArrays(v, v, 9)
      val all = cents.map { case (_, sv, ns2) =>
        val dot: Double = graft.functions.ExactDot.computeArrays(v, sv, 9)
        dot / (math.sqrt(n2) * math.sqrt(ns2))
      }
      assert(cosWin >= all.max - 1e-12, s"id $id: winning cos $cosWin < max ${all.max}")
    }
  }
}
