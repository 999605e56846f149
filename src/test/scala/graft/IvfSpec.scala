package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val corpus = {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    // 3 gaussian blobs in 8-d so a quantizer has real structure to find
    val centers = Array.fill(3)(Array.fill(8)(rng.nextGaussian() * 4))
    (0 until 900).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.5).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("kmeans quantizer separates gaussian blobs") {
    val cents = Similarity.kmeansCentroids(corpus, k = 3, sampleRows = 900, iters = 10)
    assert(cents.length == 3)
    // cells are balanced across blobs: each cell gets roughly a third
    val cells = corpus.select(
      Similarity.ivfCells(col("embedding"), cents, 1)(0).as("cell"))
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(cells.length == 3, s"expected 3 non-empty cells, got ${cells.length}")
    assert(cells.forall(n => n > 200 && n < 400), cells.toSeq.toString)
  }

  test("ivfTopK probing all cells equals brute-force top-k") {
    val cents = Similarity.kmeansCentroids(corpus, k = 3, sampleRows = 900, iters = 10)
    val q = corpus.where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val ivf = Similarity.ivfTopK(corpus, q, cents, nprobe = 3, k = 4)
      .orderBy("qid", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val brute = Similarity.bruteTopK(corpus, q, k = 4)
      .orderBy("qid", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(ivf.toSeq == brute.toSeq)
  }

  test("single-probe recall is high when blobs are separable") {
    val cents = Similarity.kmeansCentroids(corpus, k = 3, sampleRows = 900, iters = 10)
    val q = corpus.where(col("vec_id") < 30)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val ivf = Similarity.ivfTopK(corpus, q, cents, nprobe = 1, k = 3)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteTopK(corpus, q, k = 3)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall > 0.9, s"nprobe=1 recall $recall")
  }
}
