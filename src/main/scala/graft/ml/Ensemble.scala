package graft.ml

import org.apache.spark.ml.classification.{GBTClassifier, OneVsRest, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** M6-M9: seeded randomized-hyperparameter multiclass ensemble + majority
  * vote — the Spark rendering of the reference's 11 LightGBM boosters with
  * per-model randomized params and seeds SEED+i
  * (`/root/reference/generate_submission.py:47-130`, draws `:89-99,111-121`,
  * vote `:493-502`). LightGBM is unavailable offline; MLlib's
  * RandomForestClassifier is the native-multiclass stand-in (SURVEY §7.3).
  *
  * Determinism: a seeded scala.util.Random drives the param draws in a fixed
  * sequence; each member gets seed SEED+i; the vote is the deterministic
  * min-on-ties mode (numpy argmax-of-bincount takes the lowest class,
  * `generate_submission.py:496-502`).
  */
object Ensemble {
  val Seed = 1337

  final case class Member(numTrees: Int, maxDepth: Int, minInstances: Int, seed: Long)

  /** The reference's randomized param draws, transposed to RF knobs. */
  def drawMembers(nModels: Int, seed: Int = Seed): Seq[Member] = {
    val rng = new Random(seed)
    Seq.tabulate(nModels) { i =>
      Member(
        numTrees = 8 + rng.nextInt(9), // 8-16
        maxDepth = 4 + rng.nextInt(3), // 4-6
        minInstances = 1 + rng.nextInt(5), // 1-5
        seed = seed + i)
    }
  }

  /** Fit the ensemble on (featureCols → labelCol), score `test`, and return
    * it with per-member `pred_i` columns plus the majority-vote `outCol`
    * (ties → lowest class). Weights column optional (the reference doubles
    * s05, `generate_submission.py:61-64`).
    */
  def fitPredictVote(
      train: DataFrame,
      test: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      nModels: Int,
      outCol: String,
      weightCol: Option[String] = None): DataFrame =
    fitScoreVote(train, test, featureCols, nModels, outCol,
      i => Seq(s"__p_$i", s"__prob_$i", s"__raw_$i"),
      (m, i, trainVec) => {
        val est = new RandomForestClassifier()
          .setFeaturesCol("__features")
          .setLabelCol(labelCol)
          .setPredictionCol(s"__p_$i")
          .setProbabilityCol(s"__prob_$i")
          .setRawPredictionCol(s"__raw_$i")
          .setNumTrees(m.numTrees)
          .setMaxDepth(m.maxDepth)
          .setMinInstancesPerNode(m.minInstances)
          .setSeed(m.seed)
        weightCol.foreach(est.setWeightCol)
        est.fit(trainVec)
      })

  /** Boosted-trees flavor of [[fitPredictVote]] — the closest offline MLlib
    * rendering of the reference's LightGBM boosters: each member is a
    * One-vs-Rest wrapper over a seeded [[GBTClassifier]] (GBT in MLlib is
    * binary-only, so multiclass costs nClasses binary fits per member —
    * nModels·nClasses boosted fits total). Same param draws, same seeds,
    * same lowest-class-tie vote as the RF flavor. Prefer the RF flavor when
    * fit count dominates (many classes × many members); prefer this one
    * when per-model behavior should mirror gradient boosting.
    */
  def fitPredictVoteBoosted(
      train: DataFrame,
      test: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      nModels: Int,
      outCol: String,
      weightCol: Option[String] = None): DataFrame =
    fitScoreVote(train, test, featureCols, nModels, outCol,
      i => Seq(s"__p_$i", s"__raw_$i"),
      (m, i, trainVec) => {
        val gbt = new GBTClassifier()
          .setFeaturesCol("__features")
          .setLabelCol(labelCol)
          .setMaxIter(m.numTrees) // boosting rounds <- the tree-count draw
          .setMaxDepth(m.maxDepth)
          .setMinInstancesPerNode(m.minInstances)
          .setSeed(m.seed)
        weightCol.foreach(gbt.setWeightCol)
        val est = new OneVsRest()
          .setClassifier(gbt)
          // fit the per-class binary GBTs concurrently — OneVsRest defaults
          // to parallelism=1, serializing nClasses boosted fits per member;
          // each binary fit is independently specified and seeded, so the
          // fitted models (and the vote) are identical at any parallelism
          .setParallelism(8)
          .setFeaturesCol("__features")
          .setLabelCol(labelCol)
          .setPredictionCol(s"__p_$i")
          .setRawPredictionCol(s"__raw_$i")
        weightCol.foreach(est.setWeightCol)
        est.fit(trainVec)
      })

  /** Shared ensemble skeleton: assemble features, cache the training frame,
    * fit the seeded members as CONCURRENT Spark jobs (each fit is
    * independently seeded, so per-model results are scheduling-invariant —
    * the sequential version serialized nModels × MLlib job latency), score
    * the test frame with each model, vote. The cache is released even when
    * a fit throws.
    */
  private def fitScoreVote(
      train: DataFrame,
      test: DataFrame,
      featureCols: Seq[String],
      nModels: Int,
      outCol: String,
      memberCols: Int => Seq[String],
      fitMember: (Member, Int, DataFrame) => org.apache.spark.ml.Transformer): DataFrame = {
    val asm = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("__features")
    val trainVec = asm.transform(train).cache()
    try {
      trainVec.count() // materialize once before the concurrent fits
      val testVec = asm.transform(test)
      val models = parallelFits(
        drawMembers(nModels).zipWithIndex.map { case (m, i) => () => fitMember(m, i, trainVec) })
      val scored = models.zipWithIndex.foldLeft(testVec) { case (acc, (model, i)) =>
        model.transform(acc)
          .withColumn(s"pred_$i", col(s"__p_$i").cast("int"))
          .drop(memberCols(i): _*)
      }
      withVote(scored, nModels, outCol)
    } finally trainVec.unpersist()
  }

  /** Run independent fit thunks as concurrent Spark jobs, preserving order. */
  private def parallelFits[M](thunks: Seq[() => M]): Seq[M] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(thunks.map(t => Future(t()))), Duration.Inf)
  }

  /** Majority vote with lowest-class tie-break (numpy bincount-argmax
    * semantics), array-local per row: candidates whose count equals the
    * max count, then array_min.
    */
  private def withVote(scored: DataFrame, nModels: Int, outCol: String): DataFrame = {
    val arr = s"array(${(0 until nModels).map(i => s"pred_$i").mkString(",")})"
    val voteSql =
      s"""array_min(
         |  filter(array_distinct($arr),
         |    c -> size(filter($arr, x -> x = c)) =
         |         array_max(transform(array_distinct($arr),
         |           c2 -> size(filter($arr, x -> x = c2))))))""".stripMargin
    scored.withColumn(outCol, expr(voteSql)).drop("__features")
  }
}
