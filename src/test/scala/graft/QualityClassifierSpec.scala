package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("solver: known 3x3 system") {
    // A = [[2,1,0],[1,3,1],[0,1,2]], b = [3,7,7] -> x = [1,1,3]
    val a = Array(Array(2.0, 1.0, 0.0), Array(1.0, 3.0, 1.0), Array(0.0, 1.0, 2.0))
    val x = QualityClassifier.solve(a, Array(3.0, 7.0, 7.0))
    x.zip(Seq(1.0, 1.0, 3.0)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-9)
    }
  }

  test("separable labels are learned exactly, including held-out docs") {
    val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val mk = (i: Long) => {
      val words = (0 until 8).map(k => vocabA(((i + k) % vocabA.size).toInt))
      val bad = i % 3 == 0
      (i, (if (bad) words :+ "spamtoken" else words).mkString(" "), if (bad) 1.0 else 0.0)
    }
    val all = (0L until 200L).map(mk).toDF("doc_id", "text", "y")
    val train = all.where(col("doc_id") < 150)
    val test = all.where(col("doc_id") >= 150)
    val feats = QualityClassifier.featurize(train, "doc_id", "text", dim = 32)
    val model = QualityClassifier.trainRidge(feats,
      train.select(col("doc_id"), col("y")), "doc_id", dim = 32)
    val testFeats = QualityClassifier.featurize(test, "doc_id", "text", dim = 32)
    val wrong = QualityClassifier.score(testFeats, model, "doc_id")
      .join(test.select(col("doc_id"), col("y")), "doc_id")
      .where((col("score") >= model.threshold) =!= (col("y") === 1.0))
      .count()
    assert(wrong == 0)
  }

  test("gate drops exactly the flagged docs; pipeline classifier config applies it") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta spamtoken"),
      (3L, "beta gamma delta epsilon zeta eta theta iota")).toDF("doc_id", "text")
    val labeled = docs.withColumn("y",
      array_contains(split(col("text"), " "), "spamtoken").cast("double"))
    val feats = QualityClassifier.featurize(labeled, "doc_id", "text", dim = 32)
    val model = QualityClassifier.trainRidge(feats,
      labeled.select(col("doc_id"), col("y")), "doc_id", dim = 32)
    val kept = QualityClassifier.gate(docs, "doc_id", "text", model)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    // CorpusPipeline applies the same gate through its config
    val (cleaned, _) = graft.plans.CorpusPipeline.run(docs, "doc_id", "text",
      graft.plans.CorpusPipeline.Config(audit = false, minQuality = 0.0,
        minTokens = 1, classifier = Some(model)))
    assert(cleaned.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }
}
