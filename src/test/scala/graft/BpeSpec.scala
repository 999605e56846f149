package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Bpe

class BpeSpec extends AnyFunSuite {

  test("hand-worked merge sequence (counts + deterministic tiebreaks)") {
    // corpus = {"aaab"}: (a,a) wins round 1 with count 2; round 2 is a
    // count tie broken lexicographically — (a,b) < (aa,a)
    val m = Bpe.train(Seq(("aaab", 1L)), numMerges = 10)
    assert(m.merges == Vector(("a", "a"), ("a", "b"), ("aa", "ab")))
    assert(m.encodeWord("aaab") == Vector("aaab"))
    assert(m.encodeWord("aab") == Vector("aa", "b")) // (a,b) outranked at i by... (a,a) first
  }

  test("Sennrich-style corpus learns frequent suffix first") {
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.train(counts, numMerges = 4)
    // 'es' (count 9) then 'est' (count 9) dominate, exactly as in the paper
    assert(m.merges.take(2) == Vector(("e", "s"), ("es", "t")))
    assert(m.encodeWord("newest").last == "est")
    assert(m.encodeWord("widest").last == "est")
  }

  test("encoding always concatenates back to the word; unknown chars stay singletons") {
    val m = Bpe.train(Seq(("hello", 3L), ("help", 2L), ("yellow", 4L)), 8)
    Seq("hello", "help", "yellow", "hollow", "xyz", "").foreach { w =>
      assert(m.encodeWord(w).mkString == w, s"concat identity broke for '$w'")
    }
    assert(m.encodeWord("qqq").forall(_.length == 1) ||
      m.merges.contains(("q", "q"))) // no learned q-merges ⇒ singleton pieces
  }

  test("training is deterministic and more merges never lengthen encodings") {
    val counts = Seq(("banana", 7L), ("bandana", 3L), ("cabana", 5L), ("anagram", 2L))
    val a = Bpe.train(counts, 12)
    val b = Bpe.train(counts, 12)
    assert(a.merges == b.merges)
    val small = Bpe.train(counts, 4)
    counts.foreach { case (w, _) =>
      assert(a.encodeWord(w).length <= small.encodeWord(w).length, s"regressed on $w")
    }
  }

  test("distributed train + broadcast encode round-trips through Spark") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (0L until 200L).map { i =>
      val words = Seq("stream", "process", "processing", "streaming", "token",
        "tokens", "tokenize", "data", "database")
      val rng = new java.util.Random(i * 2654435761L)
      (i, Seq.fill(8)(words(rng.nextInt(words.length))).mkString(" "))
    }.toSeq.toDF("doc_id", "text")
    val m = Bpe.trainFromCorpus(docs, "text", numMerges = 24, topWords = 100)
    assert(m.merges.length == 24)
    val enc = Bpe.encodeDocs(docs, "text", "doc_id", m).collect()
    assert(enc.length == 200)
    // every encoding concatenates back to the whitespace-stripped text
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { r =>
      val id = r.getLong(0)
      val pieces = r.getSeq[String](1)
      assert(pieces.mkString == texts(id).replace(" ", ""))
      assert(r.getInt(2) == pieces.length)
    }
    // shared stems compress: 'token'/'process'/'stream' should be single
    // pieces after 24 merges on this tiny vocabulary
    assert(m.encodeWord("token").length <= 2)
  }
}
