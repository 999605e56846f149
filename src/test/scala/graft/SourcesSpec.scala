package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.BoosterModel
import graft.sources.{BatchSources, BinnedCache, DataLoader}
import graft.tree.{GBTTrainer, TrainParams}

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext
  import spark.implicits._

  test("libsvm and csv URIs load the same values") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_src")
    java.nio.file.Files.writeString(tmp.resolve("d.libsvm"),
      "1.5 1:2.0 3:4.5\n-0.5 2:1.25\n")
    java.nio.file.Files.writeString(tmp.resolve("d.csv"),
      "1.5,2.0,0.0,4.5\n-0.5,0.0,1.25,0.0\n")
    val lsv = DataLoader.load(spark, s"$tmp/d.libsvm?format=libsvm")
      .orderBy("label").collect()
    val csv = DataLoader.load(spark, s"$tmp/d.csv?format=csv")
      .orderBy("label").collect()
    assert(lsv.map(_.getDouble(0)).toSeq == Seq(-0.5, 1.5))
    lsv.zip(csv).foreach { case (a, b) =>
      assert(a.getDouble(0) == b.getDouble(0))
      assert(a.getSeq[Double](1) == b.getSeq[Double](1))
    }
    // jsonl loads the same rows
    java.nio.file.Files.writeString(tmp.resolve("d.jsonl"),
      "{\"label\": 1.5, \"features\": [2.0, 0.0, 4.5]}\n" +
        "{\"label\": -0.5, \"features\": [0.0, 1.25, 0.0]}\n")
    val jsl = DataLoader.load(spark, s"$tmp/d.jsonl")
      .orderBy("label").collect()
    lsv.zip(jsl).foreach { case (a, b) =>
      assert(a.getDouble(0) == b.getDouble(0))
      assert(a.getSeq[Double](1) == b.getSeq[Double](1))
    }
    // orc loads the same rows (columnar twin of the parquet contract)
    import spark.implicits._
    val orcPath = s"$tmp/d_orc"
    Seq((1.5, 2.0, 0.0, 4.5), (-0.5, 0.0, 1.25, 0.0))
      .toDF("label", "f0", "f1", "f2")
      .write.mode("overwrite").orc(orcPath)
    val orc = DataLoader.load(spark, s"$orcPath?format=orc")
      .orderBy("label").collect()
    lsv.zip(orc).foreach { case (a, b) =>
      assert(a.getDouble(0) == b.getDouble(0))
      assert(a.getSeq[Double](1) == b.getSeq[Double](1))
    }
    // format inference from extension + #cache suffix ignored
    assert(DataLoader.parseUri("x/y.csv#cache").format == "csv")
    assert(DataLoader.parseUri("x/y.jsonl#cache").format == "jsonl")
    assert(DataLoader.parseUri("x/y.orc#cache").format == "orc")
    assert(DataLoader.parseUri("x/y.txt?format=libsvm#cache").format == "libsvm")
  }

  test("iterator source unions batches; ragged batches unify column count") {
    val b1 = Seq((1.0, Seq(1.0, 2.0))).toDF("label", "features")
    val b2 = Seq((2.0, Seq(3.0, 4.0))).toDF("label", "features")
    val all = BatchSources.fromBatches(Iterator(b1, b2))
    assert(all.count() == 2)
    intercept[IllegalArgumentException] {
      BatchSources.append(b1, Seq((1.0, "x")).toDF("label", "other"))
    }
    val ragged = Seq(Seq(1.0), Seq(1.0, 2.0, 3.0)).toDF("features")
    assert(BatchSources.unifiedFeatureCount(ragged) == 3)
    val padded = BatchSources.unifyColumns(ragged)
      .select("features").as[Seq[Double]].collect()
    assert(padded.forall(_.size == 3))
    assert(padded.exists(r => r(1).isNaN && r(2).isNaN), "padding must be NaN missing")
  }

  test("binned-table cache roundtrip trains to the identical model") {
    val rng = new scala.util.Random(3)
    val rows = (0 until 1500).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, 2.0 * x(0) - x(1) + 0.1 * rng.nextGaussian(), 1.0)
    }
    val data = sc.parallelize(rows, 3)
    val p = TrainParams(numRounds = 3, maxDepth = 3, maxBin = 32, seed = 5)
    val trainer = new GBTTrainer(p)
    val direct = trainer.fit(data)

    // rebuild the binned form the same way fit does, cache it, reload, fit
    val nf = 2
    val cuts = graft.data.Binning.findCuts(data.map(r => (r._1, r._3)), nf, p.maxBin)
    val binned = data.zipWithIndex().map { case ((f, y, w), id) =>
      graft.tree.BInst(cuts.binRow(f), y, w, id)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_cache").toString
    BinnedCache.save(spark, binned, cuts, tmp)
    val (loaded, cuts2) = BinnedCache.load(spark, tmp)
    assert(cuts2.cuts.map(_.toSeq).toSeq == cuts.cuts.map(_.toSeq).toSeq)
    // reference get_quantile_cut CSR layout: indptr deltas = per-feature
    // bin counts, flat data re-slices to the per-feature arrays
    val (indptr, flat) = cuts.quantileCut
    assert(indptr.length == nf + 1 && indptr(0) == 0L)
    (0 until nf).foreach { f =>
      assert(flat.slice(indptr(f).toInt, indptr(f + 1).toInt).toSeq ==
        cuts.cuts(f).toSeq)
    }
    // the cache contract: rows and cuts roundtrip EXACTLY
    val origRows = binned.map(r => (r.bins.toSeq, r.label, r.weight, r.rowId)).collect().toSet
    val backRows = loaded.map(r => (r.bins.toSeq, r.label, r.weight, r.rowId)).collect().toSet
    assert(backRows == origRows, "binned rows must roundtrip exactly")
    // training from the cache fits as well as the direct path (tree
    // structure can flip on near-ties: treeAggregate merge order differs
    // across partition layouts, so exact model equality is not guaranteed)
    val fromCache = new GBTTrainer(p).fitBinned(
      loaded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), cuts2, nf)
    def rmse(m: graft.model.BoosterModel) = math.sqrt(rows.map { case (x, y, _) =>
      math.pow(m.margin(x)(0) - y, 2) }.sum / rows.size)
    assert(math.abs(rmse(direct) - rmse(fromCache)) < 0.05,
      s"rmse ${rmse(direct)} vs cache ${rmse(fromCache)}")
  }

  test("model dump text and json formats") {
    val rng = new scala.util.Random(9)
    val rows = (0 until 500).map { _ =>
      val x = Array(rng.nextGaussian())
      (x, if (x(0) > 0) 1.0 else -1.0, 1.0)
    }
    val m = new GBTTrainer(TrainParams(numRounds = 1, maxDepth = 2, seed = 1))
      .fit(sc.parallelize(rows, 2))
    val text = BoosterModel.toText(m.trees(0), withStats = true)
    assert(text.contains("0:[f0<") && text.contains("leaf=") && text.contains("cover="))
    assert(text.linesIterator.count(_.contains("leaf=")) == m.trees(0).numLeaves)
    val json = BoosterModel.toDumpJson(m.trees(0))
    assert(json.contains("\"split\":\"f0\"") && json.contains("\"children\""))
    val dot = BoosterModel.toDot(m.trees(0))
    assert(dot.startsWith("digraph"))
  }

  test("gradient_based sampling trains and tracks the full fit") {
    val rng = new scala.util.Random(21)
    // skewed: 5% of rows carry huge residuals — exactly where |g| sampling shines
    val rows = (0 until 4000).map { _ =>
      val x = Array(rng.nextGaussian())
      val y = if (rng.nextDouble() < 0.05) 20.0 * x(0) else x(0)
      (x, y, 1.0)
    }
    val data = sc.parallelize(rows, 4)
    val p = TrainParams(numRounds = 5, maxDepth = 3, eta = 0.5, seed = 7)
    val full = new GBTTrainer(p).fit(data)
    val gb = new GBTTrainer(p.copy(subsample = 0.4,
      samplingMethod = "gradient_based")).fit(data)
    def rmse(m: BoosterModel) = math.sqrt(rows.map { case (x, y, _) =>
      math.pow(m.margin(x)(0) - y, 2) }.sum / rows.size)
    val (rf, rg) = (rmse(full), rmse(gb))
    assert(!rg.isNaN && rg < rmse(BoosterModel(Array.empty, Array.empty,
      Array.empty, full.baseScore, "reg:squarederror", 1, 1)),
      "sampled fit must beat the constant model")
    assert(rg < rf * 1.5 + 0.2, s"gradient_based rmse $rg vs full $rf")
  }
}
