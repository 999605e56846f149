package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.param.Params
import org.apache.spark.ml.util.{MLReadable, MLReader, MLWritable, MLWriter}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.BoosterModel

/** Save/load for the graft estimators and models (the reference's
  * `MLWritable` surface, `XGBoostEstimator.scala` DefaultXGBoostParamsWriter
  * analog): one `graft.json` per path holding {class, uid, params
  * (Param.jsonEncode per value), booster JSON (models only)}. Hadoop FS IO
  * so any Spark-supported filesystem works. */
private[api] class GraftWriter(instance: Params, booster: Option[BoosterModel])
    extends MLWriter {
  override protected def saveImpl(path: String): Unit = {
    val params = JObject(instance.extractParamMap().toSeq
      .filter(p => p.value != null)
      .map(p => p.param.name -> JString(p.param.asInstanceOf[org.apache.spark.ml.param.Param[Any]]
        .jsonEncode(p.value))).toList)
    val root = JObject(List(
      "class" -> JString(instance.getClass.getName),
      "uid" -> JString(instance.uid),
      "params" -> params) ++
      booster.map(b => "booster" -> JString(b.toJson)).toList)
    val json = JsonMethods.compact(JsonMethods.render(root))
    val file = new Path(path, "graft.json")
    val fs = file.getFileSystem(sc.hadoopConfiguration)
    val out = fs.create(file, shouldOverwrite)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    // Pipeline compatibility: PipelineModel.load locates each stage through
    // MLlib's standard `metadata` file (DefaultParamsReader.loadParamsInstance
    // reads `class` there, then dispatches to OUR MLReader, which reads
    // graft.json) — param content lives in graft.json, so the maps are empty
    val meta = JsonMethods.compact(JsonMethods.render(JObject(List(
      "class" -> JString(instance.getClass.getName),
      "timestamp" -> JInt(System.currentTimeMillis()),
      "sparkVersion" -> JString(org.apache.spark.SPARK_VERSION),
      "uid" -> JString(instance.uid),
      "paramMap" -> JObject(Nil),
      "defaultParamMap" -> JObject(Nil)))))
    val metaFile = new Path(path, "metadata")
    val mout = fs.create(metaFile, shouldOverwrite)
    try mout.write(meta.getBytes("UTF-8")) finally mout.close()
  }
}

trait GraftWritableParams extends MLWritable { self: Params =>
  override def write: MLWriter = new GraftWriter(this, None)
}

trait GraftWritableModel extends MLWritable { self: Params =>
  def booster: BoosterModel
  override def write: MLWriter = new GraftWriter(this, Some(booster))
}

trait GraftReadable[T <: Params] extends MLReadable[T] {
  /** instantiate with uid (+ booster for models). */
  protected def make(uid: String, model: Option[BoosterModel]): T

  override def read: MLReader[T] = new MLReader[T] {
    override def load(path: String): T = {
      val file = new Path(path, "graft.json")
      val fs = file.getFileSystem(sc.hadoopConfiguration)
      val in = fs.open(file)
      val json = try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, "UTF-8")
      } finally in.close()
      val j = JsonMethods.parse(json)
      implicit val fmt: Formats = DefaultFormats
      val uid = (j \ "uid").extract[String]
      val booster = (j \ "booster").toOption.map(b => BoosterModel.fromJson(b.extract[String]))
      val instance = make(uid, booster)
      (j \ "params") match {
        case JObject(fields) => fields.foreach {
          case (name, JString(enc)) =>
            val p = instance.getParam(name)
            instance.set(p, p.jsonDecode(enc))
          case _ => () // graft.json params are always string-encoded
        }
        case _ => ()
      }
      instance
    }
  }

  override def load(path: String): T = read.load(path)
}
