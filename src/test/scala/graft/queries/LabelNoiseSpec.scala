package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Detection power of the `sim_label_noise` neighborhood-consensus audit.
  *
  * The DuckDB oracle proves Spark and DuckDB agree on the arithmetic; this
  * spec proves the audit actually DETECTS a planted mislabel. Fixture: two
  * direction-separated embedding clusters (dims 0/1 vs dims 32/33 — within-
  * cluster cosine ≈ 1, cross-cluster ≈ 0) of 40 vectors each, labels 0 and
  * 1, with exactly one cluster-A vector planted with cluster-B's label.
  * Every vector's five nearest neighbors by cosine are same-cluster mates
  * regardless of how the deterministic IVF fit slices the clusters into
  * cells, so the planted vector's neighborhood votes unanimously against
  * its label while a genuine vector sees at most the single planted
  * dissenter (1 of 5 — never a majority). Jitter magnitudes are distinct
  * per vector, so no cosine ties hide ranking bugs.
  */
class LabelNoiseSpec extends graft.SparkSpec {
  private val planted = 17L

  private def plantedFixture(): String = {
    import spark.implicits._
    val dim = 64
    def vec(base: Int, jitterDim: Int, i: Int): Array[Float] = {
      val a = new Array[Float](dim)
      a(base) = 1.0f
      a(jitterDim) = 0.001f * (i + 1)
      a
    }
    // ids 0..39 cluster A (label 0), 40..79 cluster B (label 1);
    // id 17 (cluster A) planted with label 1.
    val rows = (0 until 80).map { i =>
      val (base, jit) = if (i < 40) (0, 1) else (32, 33)
      val label = if (i.toLong == planted) 1 else (if (i < 40) 0 else 1)
      (i.toLong, vec(base, jit, i), label)
    }
    val dir = Files.createTempDirectory("graft_label_noise").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def detects(query: String): Unit = {
    val dir = plantedFixture()
    val out = SparkEntry.queries(query)(spark, dir)
      .select("vec_id", "label", "n_nb", "n_agree", "suspect").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    graft.ops.Caches.releaseAll()

    val (plLabel, plNb, plAgree, plSuspect) = out(planted)
    assert(plLabel == 1 && plNb == 5 && plAgree == 0 && plSuspect == 1L,
      s"planted vector not unanimously flagged: ${out(planted)}")
    val falsePositives = out.collect { case (id, (_, _, _, s)) if s == 1L && id != planted => id }
    assert(falsePositives.isEmpty, s"genuine vectors flagged suspect: $falsePositives")
    // every non-singleton-cell vector is audited exactly once; with 40-way
    // clusters no cell is a singleton, so all 80 rows must be present
    assert(out.size == 80, s"expected all 80 vectors audited, got ${out.size}")
  }

  test("a planted mislabel is flagged suspect; genuine labels are not") {
    detects("sim_label_noise")
  }

  test("the hierarchical routing variant detects the same planted mislabel") {
    // k = hierK(80) = 2 per level → 4 leaf cells of ~20; every vector's
    // five nearest leaf-mates are still same-cluster, so detection power
    // survives the two-level routing (the audit must not lose the signal
    // to the extra partition boundary)
    detects("sim_label_noise_hier")
  }
}
