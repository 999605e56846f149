package graft
import org.apache.spark.sql.functions._
object DbgMain {
  def main(args: Array[String]): Unit = {
    import TestSpark._
    spark.sparkContext.setLogLevel("ERROR")
    val Sim = graft.ext.Similarity
    val cents8 = Sim.hyperplanes(8, 64, seed = 7L)
    val cents2 = cents8.take(2)
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select("vec_id", "embedding")
      val prior = e.where(col("vec_id") % 3 === 1)
      println(s"== $sf prior=" + prior.count())
      println("k=2: " + Sim.cellOccupancy(Sim.semanticKeys(prior, cents2), 0)
        .orderBy("cell").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
      println("k=8: " + Sim.cellOccupancy(Sim.semanticKeys(prior, cents8), 0)
        .orderBy("cell").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    }
    spark.stop()
  }
}
