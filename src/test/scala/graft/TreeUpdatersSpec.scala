package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Node, Tree}
import graft.tree.{GBTTrainer, TrainParams, TreeUpdaters}

class TreeUpdatersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext

  private def noisyData(seed: Int, n: Int = 3000) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, (if (x(0) > 0) 2.0 else -2.0) + 0.5 * rng.nextGaussian(), 1.0)
    }
  }

  test("prune collapses weak splits recursively and keeps strong ones") {
    val data = sc.parallelize(noisyData(31), 4)
    // gamma=0 at train time → tree full of noise splits at depth>1
    val m = new GBTTrainer(TrainParams(numRounds = 1, maxDepth = 5,
      gamma = 0.0, eta = 1.0, seed = 2)).fit(data)
    val before = m.trees(0).numLeaves
    val hard = TreeUpdaters.prune(m, gamma = 1e9) // everything collapses
    assert(hard.trees(0).numLeaves == 1, "gamma=inf must collapse to the root leaf")
    val none = TreeUpdaters.prune(m, gamma = 0.0)
    assert(none.trees(0).numLeaves == before, "gamma=0 must be a no-op")
    // the x0 root split carries all the signal: a mid gamma keeps it
    val mid = TreeUpdaters.prune(m, gamma = 500.0)
    val t = mid.trees(0)
    assert(t.numLeaves < before && t.numLeaves >= 2,
      s"expected partial prune: $before -> ${t.numLeaves}")
    assert(t.nodes(0).feature == 0, "root signal split must survive")
  }

  test("prune collapse value equals the node's own weight") {
    // hand-built: root split (big gain) -> [leaf, weak split with stored weight]
    val tree = Tree(Array(
      Node(0, 0.0, defaultLeft = true, 1, 2, Array(0.25), 100.0, 10.0, Array.empty),
      Node.makeLeaf(Array(-1.0), 5.0),
      Node(1, 0.0, defaultLeft = true, 3, 4, Array(0.9), 0.01, 5.0, Array.empty),
      Node.makeLeaf(Array(0.8), 2.0),
      Node.makeLeaf(Array(1.1), 3.0)))
    val pruned = TreeUpdaters.prune(tree, gamma = 1.0)
    assert(pruned.numLeaves == 2)
    // the collapsed node predicts its stored weight 0.9
    assert(pruned.predict(Array(1.0, 99.0))(0) == 0.9)
    assert(pruned.predict(Array(-1.0, 0.0))(0) == -1.0)
  }

  test("refresh on the same data reproduces leaf values") {
    val rows = noisyData(37)
    val data = sc.parallelize(rows, 4)
    val p = TrainParams(numRounds = 3, maxDepth = 3, eta = 0.5, seed = 4)
    val m = new GBTTrainer(p).fit(data)
    val r = TreeUpdaters.refresh(m, data, p)
    m.trees.zip(r.trees).foreach { case (a, b) =>
      a.nodes.zip(b.nodes).foreach { case (na, nb) =>
        assert(na.feature == nb.feature, "structure must be preserved")
        if (na.isLeaf)
          assert(math.abs(na.leaf(0) - nb.leaf(0)) < 0.05,
            s"leaf ${na.leaf(0)} vs refreshed ${nb.leaf(0)}")
      }
    }
  }

  test("refresh on shifted labels shifts predictions, not structure") {
    val rows = noisyData(41)
    val data = sc.parallelize(rows, 4)
    val p = TrainParams(numRounds = 3, maxDepth = 3, eta = 0.5, seed = 4)
    val m = new GBTTrainer(p).fit(data)
    val shifted = sc.parallelize(rows.map { case (x, y, w) => (x, y + 10.0, w) }, 4)
    val r = TreeUpdaters.refresh(m, shifted, p)
    // structure identical
    m.trees.zip(r.trees).foreach { case (a, b) =>
      assert(a.nodes.map(_.feature).toSeq == b.nodes.map(_.feature).toSeq)
    }
    // predictions track the shift (base score unchanged, leaves absorb it
    // up to the per-tree shrinkage geometric series)
    val before = rows.take(50).map { case (x, _, _) => m.margin(x)(0) }
    val after = rows.take(50).map { case (x, _, _) => r.margin(x)(0) }
    val meanShift = after.zip(before).map { case (a, b) => a - b }.sum / 50
    assert(meanShift > 7.0, s"mean shift $meanShift, want most of +10")
  }
}
