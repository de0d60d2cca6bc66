package graft

import org.apache.spark.sql.functions._

import graft.text.QualityClassifier
import graft.text.QualityClassifier.QcModel

/** Ground truth for the trained quality classifier: convergence,
  * separation of the planted low-quality class, serving-formula
  * exactness, and fit determinism. */
class QualityClassifierSpec extends SparkSpecBase {

  private lazy val model: QcModel = QualityClassifier.fitFor(spark, sf)

  test("GD training converges: loss falls far below the ln(2) start") {
    val h = model.lossHistory
    assert(h.head <= math.log(2) + 1e-9) // epoch 1 starts from w = 0
    assert(h.last < 0.15, s"final loss ${h.last}")
    // Adagrad with an aggressive rate oscillates early; converged
    // means the tail is settled, not that every step was downhill
    val tail = h.takeRight(10)
    assert(tail.max < 0.2, s"unsettled tail: ${tail.mkString(",")}")
  }

  test("classifier separates the planted spam class") {
    val scored = QualityClassifier.score(
      QualityClassifier.plantedDocs(Tables.documents(spark, sf)),
      "doc_id", "text", QualityClassifier.plantedLabel, model)
    val agg = scored.agg(
      sum((col("pred") === col("label")).cast("int")).as("correct"),
      count(lit(1)).as("n")).collect()(0)
    val acc = agg.getLong(0).toDouble / agg.getLong(1)
    assert(acc >= 0.95, s"training accuracy $acc")
  }

  test("serving output is the exact integer decision formula") {
    val planted = QualityClassifier.plantedDocs(Tables.documents(spark, sf))
    val rows = QualityClassifier.score(planted, "doc_id", "text",
      QualityClassifier.plantedLabel, model).limit(100).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pred = r.getAs[Long]("w_sum_micro") +
        model.biasMicro * r.getAs[Int]("n_feats") >= 0
      assert(r.getAs[Int]("pred") == (if (pred) 1 else 0))
      assert(r.getAs[Int]("n_feats") > 0)
    }
    assert(model.weightsMicro.length == QualityClassifier.NumBuckets)
  }

  test("fit is reproducible: two fits agree to the micro digit") {
    val docs = QualityClassifier.plantedDocs(Tables.documents(spark, sf))
    val a = QualityClassifier.fit(docs, "text", QualityClassifier.plantedLabel, epochs = 3)
    val b = QualityClassifier.fit(docs, "text", QualityClassifier.plantedLabel, epochs = 3)
    // partial-agg double sums may reorder across runs; the fitted
    // weights must still agree to within one floor-micro step
    a.weightsMicro.zip(b.weightsMicro).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1L, s"$x vs $y")
    }
    assert(math.abs(a.biasMicro - b.biasMicro) <= 1L)
  }

  test("fitFilter bounds the training sample deterministically") {
    val docs = QualityClassifier.plantedDocs(Tables.documents(spark, sf))
    val half = QualityClassifier.fit(docs, "text", QualityClassifier.plantedLabel,
      epochs = 2, fitFilter = col("doc_id") % 2 === 0)
    val full = QualityClassifier.fit(docs, "text", QualityClassifier.plantedLabel,
      epochs = 2)
    // different sample -> different (but valid) model
    assert(!half.weightsMicro.sameElements(full.weightsMicro))
  }
}
