package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ext.Similarity

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val corpus = {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    // 4 gaussian blobs in 16-d: PQ subspaces see real cluster structure
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian() * 4))
    (0 until 800).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.4).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("trained codebooks reconstruct blob structure (codes cluster by blob)") {
    val books = Similarity.pqTrainCodebooks(corpus, numSub = 4, k = 4,
      sampleRows = 800, iters = 10)
    assert(books.length == 4 && books.forall(_.length == 4) &&
      books.forall(_.forall(_.length == 4)))
    // same-blob vectors should get identical code words almost always:
    // blobs are tight (σ 0.4 vs centers σ 4), so per-subspace argmin is
    // stable within a blob
    val codes = corpus
      .select((col("vec_id") % 4).as("blob"),
        Similarity.pqCodes(col("embedding"), books).cast("string").as("code"))
      .groupBy("blob", "code").count()
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val perBlobTop = codes.groupBy(_._1).map { case (_, rows) =>
      rows.map(_._2).max.toDouble / rows.map(_._2).sum
    }
    assert(perBlobTop.forall(_ > 0.95),
      s"each blob should map to one dominant code word: $perBlobTop")
  }

  test("ADC top-k with trained codebooks returns same-blob neighbors") {
    // Within a tight blob every vector collapses to the same code word, so
    // rank-level recall vs brute force is undefined (ADC ties broken by
    // id). The PQ guarantee at this structure is BETWEEN-blob separation:
    // every top-k neighbor must come from the query's own blob.
    val books = Similarity.pqTrainCodebooks(corpus, numSub = 4, k = 8,
      sampleRows = 800, iters = 10)
    val q = corpus.where(col("vec_id") < 12)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val pq = Similarity.pqTopK(corpus, q, books, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.nonEmpty)
    pq.foreach { case (qid, vid) =>
      assert(vid % 4 == qid % 4,
        s"query $qid (blob ${qid % 4}) got cross-blob neighbor $vid (blob ${vid % 4})")
    }
  }

  test("IVF-PQ equals brute ADC when probing all cells") {
    val cents = Similarity.kmeansCentroids(corpus, k = 4, sampleRows = 800, iters = 10)
    val books = Similarity.pqTrainCodebooks(corpus, numSub = 4, k = 8,
      sampleRows = 800, iters = 10)
    val q = corpus.where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val full = Similarity.pqIvfTopK(corpus, q, cents, books, nprobe = 4, k = 5)
      .orderBy("qid", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val brute = Similarity.pqTopK(corpus, q, books, k = 5)
      .orderBy("qid", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(full.toSeq == brute.toSeq,
      "all-cell IVF-PQ must equal brute ADC (same distances, same ties)")
  }

  test("codes are deterministic and subspace-local") {
    val books = Similarity.pqCodebooks(4, 4, 4, seed = 3L)
    import spark.implicits._
    val df = Seq((1L, (0 until 16).map(_.toFloat)),
      (2L, (0 until 16).map(_.toFloat))).toDF("vec_id", "embedding")
    val codes = df.select(Similarity.pqCodes(col("embedding"), books).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes(0) == codes(1), "identical vectors must get identical codes")
    assert(codes(0).length == 4)
    assert(codes(0).forall(c => c >= 0 && c < 4))
  }
}
