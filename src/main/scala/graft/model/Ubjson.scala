package graft.model

import java.nio.ByteBuffer

import org.json4s._

/** UBJSON (ubjson.org, Draft-12) carrier for the reference's native model
  * document — the binary twin of [[XGBoostJson]]. The reference saves and
  * loads `.ubj` models through `UBJReader`/`UBJWriter`
  * (`src/common/json.cc:788-1081`), which speak a strict sub-dialect of
  * the spec; this codec reads a superset of that dialect and writes
  * exactly it, so files interop byte-level in both directions:
  *
  *   - all string/count lengths are `L` int64 (`json.cc:841` "only L is
  *     supported right now"; `EncodeStr`/`Visit(JsonArray)` always emit
  *     `L`) — we accept any integer marker on read, emit `L` on write;
  *   - plain arrays are written count-optimized (`[#L<n>` and NO `]`
  *     terminator, `json.cc:965`); `]`-terminated arrays are accepted on
  *     read;
  *   - typed arrays `[$<t>#L<n><payload>` with t ∈ d D i U I l L
  *     (`json.cc:790-816`); the tree fields are stored typed — float
  *     stats/conditions as `d` float32, child/parent/split indices as
  *     `l` int32, default_left/split_type as `U` uint8, categorical
  *     segments as `l`/`L` (`tree_model.cc:1183-1224` Save, sniffed on
  *     load via `IsA<I32Array>(parents)` at `tree_model.cc:1141`);
  *   - scalar ints use the smallest of i/I/l/L with the reference's
  *     EXCLUSIVE bounds (`json.cc:1053-1068`: a value equal to
  *     `int8_max` promotes to int16) — mirrored for byte parity;
  *   - big-endian primitives throughout (`ToBigEndian`).
  *
  * Reading produces a json4s tree (typed arrays decay to `JArray`), so
  * import shares [[XGBoostJson.fromParsed]] with the text carrier.
  */
object Ubjson {

  // ---- generic reader ------------------------------------------------------

  /** Parse UBJSON bytes into a json4s value. */
  def read(bytes: Array[Byte]): JValue = {
    val buf = ByteBuffer.wrap(bytes) // big-endian by default
    val v = parse(buf, buf.get())
    v
  }

  private def readLen(buf: ByteBuffer, marker: Byte): Long = (marker: @unchecked) match {
    case 'i' => buf.get().toLong
    case 'U' => (buf.get() & 0xff).toLong
    case 'I' => buf.getShort().toLong
    case 'l' => buf.getInt().toLong
    case 'L' => buf.getLong()
    case m => fail(s"expected integer length marker, got '${m.toChar}'")
  }

  private def readStr(buf: ByteBuffer): String = {
    val n = readLen(buf, buf.get()).toInt
    val arr = new Array[Byte](n)
    buf.get(arr)
    new String(arr, "UTF-8")
  }

  private def parse(buf: ByteBuffer, marker: Byte): JValue = (marker: @unchecked) match {
    case '{' =>
      val fields = List.newBuilder[(String, JValue)]
      while (buf.get(buf.position()) != '}') fields += ((readStr(buf), parse(buf, buf.get())))
      buf.get() // consume '}'
      JObject(fields.result())
    case '[' => parseArray(buf)
    case 'Z' => JNull
    case 'T' => JBool(true)
    case 'F' => JBool(false)
    case 'd' => JDouble(buf.getFloat().toDouble)
    case 'D' => JDouble(buf.getDouble())
    case 'S' => JString(readStr(buf))
    case 'C' => JInt(BigInt(buf.get().toInt))
    case 'i' | 'U' | 'I' | 'l' | 'L' => JInt(BigInt(readLen(buf, marker)))
    case 'H' => fail("high-precision numbers are not supported (matches the reference)")
    case m => fail(s"unknown UBJSON construct '${m.toChar}'")
  }

  private def parseArray(buf: ByteBuffer): JValue = {
    buf.get(buf.position()) match {
      case '$' => // typed array: $<type>#<len>
        buf.get()
        val t = buf.get()
        expect(buf, '#')
        val n = readLen(buf, buf.get()).toInt
        val items = new Array[JValue](n)
        var i = 0
        t match {
          case 'd' => while (i < n) { items(i) = JDouble(buf.getFloat().toDouble); i += 1 }
          case 'D' => while (i < n) { items(i) = JDouble(buf.getDouble()); i += 1 }
          case 'i' => while (i < n) { items(i) = JInt(BigInt(buf.get().toInt)); i += 1 }
          case 'U' => while (i < n) { items(i) = JInt(BigInt(buf.get() & 0xff)); i += 1 }
          case 'I' => while (i < n) { items(i) = JInt(BigInt(buf.getShort().toInt)); i += 1 }
          case 'l' => while (i < n) { items(i) = JInt(BigInt(buf.getInt())); i += 1 }
          case 'L' => while (i < n) { items(i) = JInt(BigInt(buf.getLong())); i += 1 }
          case m => fail(s"'${m.toChar}' is not supported for typed array")
        }
        JArray(items.toList)
      case '#' => // count-optimized: #<len> then n values, no ']'
        buf.get()
        val n = readLen(buf, buf.get()).toInt
        JArray(List.tabulate(n)(_ => parse(buf, buf.get())))
      case _ => // plain ']'-terminated
        val items = List.newBuilder[JValue]
        while (buf.get(buf.position()) != ']') items += parse(buf, buf.get())
        buf.get()
        JArray(items.result())
    }
  }

  private def expect(buf: ByteBuffer, c: Char): Unit = {
    val got = buf.get()
    if (got != c) fail(s"expected '$c', got '${got.toChar}'")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed UBJSON: $msg")

  // ---- generic writer ------------------------------------------------------

  private final class Out(initial: Int = 1 << 16) {
    private var a = new Array[Byte](initial)
    private var n = 0
    private def ensure(k: Int): Unit =
      if (n + k > a.length) a = java.util.Arrays.copyOf(a, math.max(a.length * 2, n + k))
    def byte(b: Int): Unit = { ensure(1); a(n) = b.toByte; n += 1 }
    def raw(bs: Array[Byte]): Unit = { ensure(bs.length); System.arraycopy(bs, 0, a, n, bs.length); n += bs.length }
    def i16(v: Short): Unit = { ensure(2); a(n) = (v >> 8).toByte; a(n + 1) = v.toByte; n += 2 }
    def i32(v: Int): Unit = { ensure(4); var i = 0; while (i < 4) { a(n + i) = (v >> (24 - 8 * i)).toByte; i += 1 }; n += 4 }
    def i64(v: Long): Unit = { ensure(8); var i = 0; while (i < 8) { a(n + i) = (v >> (56 - 8 * i)).toByte; i += 1 }; n += 8 }
    def f32(v: Float): Unit = i32(java.lang.Float.floatToIntBits(v))
    def f64(v: Double): Unit = i64(java.lang.Double.doubleToLongBits(v))
    def result(): Array[Byte] = java.util.Arrays.copyOf(a, n)
  }

  /** `L`-int64-length string payload (the key encoding; `json.cc:951`). */
  private def lenStr(o: Out, s: String): Unit = {
    val bs = s.getBytes("UTF-8")
    o.byte('L'); o.i64(bs.length.toLong); o.raw(bs)
  }

  /** Smallest-fit scalar int with the reference's exclusive bounds
    * (`json.cc:1053`). */
  private def scalarInt(o: Out, v: Long): Unit =
    if (v > Byte.MinValue && v < Byte.MaxValue) { o.byte('i'); o.byte(v.toInt) }
    else if (v > Short.MinValue && v < Short.MaxValue) { o.byte('I'); o.i16(v.toShort) }
    else if (v > Int.MinValue && v < Int.MaxValue) { o.byte('l'); o.i32(v.toInt) }
    else { o.byte('L'); o.i64(v) }

  private def typedHeader(o: Out, t: Char, n: Int): Unit = {
    o.byte('['); o.byte('$'); o.byte(t); o.byte('#'); o.byte('L'); o.i64(n.toLong)
  }

  private def f32Array(o: Out, vs: Array[Double]): Unit = {
    typedHeader(o, 'd', vs.length); vs.foreach(v => o.f32(v.toFloat))
  }
  private def i32Array(o: Out, vs: Array[Int]): Unit = {
    typedHeader(o, 'l', vs.length); vs.foreach(o.i32)
  }
  private def i64Array(o: Out, vs: Array[Long]): Unit = {
    typedHeader(o, 'L', vs.length); vs.foreach(o.i64)
  }
  private def u8Array(o: Out, vs: Array[Int]): Unit = {
    typedHeader(o, 'U', vs.length); vs.foreach(o.byte)
  }

  /** Generic json4s → UBJSON in the reference dialect (plain arrays
    * count-optimized, `L` lengths, scalar doubles as `D` float64 — the
    * reader accepts both `d` and `D`). */
  private def writeJValue(o: Out, j: JValue): Unit = j match {
    case JObject(fields) =>
      o.byte('{'); fields.foreach { case (k, v) => lenStr(o, k); writeJValue(o, v) }; o.byte('}')
    case JArray(items) =>
      o.byte('['); o.byte('#'); o.byte('L'); o.i64(items.length.toLong)
      items.foreach(writeJValue(o, _))
    case JString(s) => o.byte('S'); lenStr(o, s)
    case JDouble(d) => o.byte('D'); o.f64(d)
    case JDecimal(d) => o.byte('D'); o.f64(d.toDouble)
    case JInt(i) => scalarInt(o, i.toLong)
    case JLong(l) => scalarInt(o, l)
    case JBool(b) => o.byte(if (b) 'T' else 'F')
    case JNull | JNothing => o.byte('Z')
    case JSet(s) => fail(s"cannot serialize set $s")
  }

  // ---- model import/export -------------------------------------------------

  /** Import a reference `.ubj` tree-booster model. */
  def fromXGBoostUbj(bytes: Array[Byte]): BoosterModel =
    XGBoostJson.fromParsed(read(bytes))

  /** Import a reference `.ubj` gblinear model. */
  def linearFromXGBoostUbj(bytes: Array[Byte]): graft.linear.LinearModel =
    XGBoostJson.linearFromParsed(read(bytes))

  /** Export in the reference's UBJSON layout: the [[XGBoostJson]]
    * document with the tree fields as typed arrays, exactly as
    * `RegTree::SaveModel` stores them (`tree_model.cc:1183-1224`) so the
    * reference's typed load path (`tree_model.cc:1141` sniffs
    * `IsA<I32Array>(parents)`) is taken. Same split-threshold float32
    * successor semantics as the text export. */
  def toXGBoostUbj(m: BoosterModel): Array[Byte] = {
    // reuse the text exporter's document for everything except the trees
    // (scalars/strings carry identically in both formats), then re-emit
    // each tree with typed arrays
    val doc = org.json4s.jackson.JsonMethods.parse(XGBoostJson.toXGBoostJson(m))
    val o = new Out()

    def writeTree(tj: JValue): Unit = {
      def nums(k: String): Array[Double] =
        (tj \ k).asInstanceOf[JArray].arr.map {
          case JDouble(d) => d
          case JInt(i) => i.toDouble
          case JDecimal(d) => d.toDouble
          case other => fail(s"bad number in $k: $other")
        }.toArray
      def ints(k: String): Array[Int] =
        (tj \ k).asInstanceOf[JArray].arr.map {
          case JInt(i) => i.toInt
          case JDouble(d) => d.toInt
          case other => fail(s"bad int in $k: $other")
        }.toArray
      // multi-target trees (MultiTargetTree::SaveModel field set): typed
      // arrays, no categorical side arrays
      val isMultiTarget = (tj \ "leaf_weights") match {
        case JArray(lw) => lw.nonEmpty
        case _ => false
      }
      if (isMultiTarget) {
        o.byte('{')
        lenStr(o, "tree_param"); writeJValue(o, tj \ "tree_param")
        lenStr(o, "id"); scalarInt(o, (tj \ "id") match {
          case JInt(i) => i.toLong
          case _ => 0L
        })
        lenStr(o, "loss_changes"); f32Array(o, nums("loss_changes"))
        lenStr(o, "sum_hessian"); f32Array(o, nums("sum_hessian"))
        lenStr(o, "base_weights"); f32Array(o, nums("base_weights"))
        lenStr(o, "leaf_weights"); f32Array(o, nums("leaf_weights"))
        lenStr(o, "left_children"); i32Array(o, ints("left_children"))
        lenStr(o, "right_children"); i32Array(o, ints("right_children"))
        lenStr(o, "parents"); i32Array(o, ints("parents"))
        lenStr(o, "split_indices"); i32Array(o, ints("split_indices"))
        lenStr(o, "split_conditions"); f32Array(o, nums("split_conditions"))
        lenStr(o, "default_left"); u8Array(o, ints("default_left"))
        o.byte('}')
        return
      }
      o.byte('{')
      lenStr(o, "tree_param"); writeJValue(o, tj \ "tree_param")
      lenStr(o, "id"); scalarInt(o, (tj \ "id") match {
        case JInt(i) => i.toLong
        case _ => 0L
      })
      lenStr(o, "loss_changes"); f32Array(o, nums("loss_changes"))
      lenStr(o, "sum_hessian"); f32Array(o, nums("sum_hessian"))
      lenStr(o, "base_weights"); f32Array(o, nums("base_weights"))
      lenStr(o, "left_children"); i32Array(o, ints("left_children"))
      lenStr(o, "right_children"); i32Array(o, ints("right_children"))
      lenStr(o, "parents"); i32Array(o, ints("parents"))
      lenStr(o, "split_indices"); i32Array(o, ints("split_indices"))
      lenStr(o, "split_conditions"); f32Array(o, nums("split_conditions"))
      lenStr(o, "default_left"); u8Array(o, ints("default_left"))
      // categorical split arrays ride through from the shared document
      // (typed exactly as RegTree::SaveCategoricalSplit: U8/I32/I64)
      lenStr(o, "split_type"); u8Array(o, ints("split_type"))
      lenStr(o, "categories"); i32Array(o, ints("categories"))
      lenStr(o, "categories_nodes"); i32Array(o, ints("categories_nodes"))
      lenStr(o, "categories_segments"); i64Array(o, ints("categories_segments").map(_.toLong))
      lenStr(o, "categories_sizes"); i64Array(o, ints("categories_sizes").map(_.toLong))
      o.byte('}')
    }

    def writeVal(path: List[String], j: JValue): Unit = j match {
      case JObject(fields) =>
        o.byte('{')
        fields.foreach { case (k, v) => lenStr(o, k); writeVal(k :: path, v) }
        o.byte('}')
      case JArray(trees) if path.headOption.contains("trees") &&
          path.tail.headOption.contains("model") =>
        o.byte('['); o.byte('#'); o.byte('L'); o.i64(trees.length.toLong)
        trees.foreach(writeTree)
      case JArray(info) if path.headOption.contains("tree_info") =>
        i32Array(o, info.map { case JInt(i) => i.toInt; case _ => 0 }.toArray)
      case other => writeJValue(o, other)
    }

    writeVal(Nil, doc)
    o.result()
  }

  /** Export a graft gblinear model as reference UBJSON (weights as
    * F32Array, `gblinear_model.cc:14`). */
  def toXGBoostUbj(lm: graft.linear.LinearModel): Array[Byte] =
    linearDocToUbj(org.json4s.jackson.JsonMethods.parse(XGBoostJson.toXGBoostJson(lm)))

  /** Multiclass gblinear (same flat `[feature × group] + biases` layout). */
  def toXGBoostUbj(lm: graft.linear.MultiLinearModel): Array[Byte] =
    linearDocToUbj(org.json4s.jackson.JsonMethods.parse(XGBoostJson.toXGBoostJson(lm)))

  def linearMultiFromXGBoostUbj(bytes: Array[Byte]): graft.linear.MultiLinearModel =
    XGBoostJson.linearMultiFromParsed(read(bytes))

  private def linearDocToUbj(doc: JValue): Array[Byte] = {
    val o = new Out()
    def writeVal(path: List[String], j: JValue): Unit = j match {
      case JObject(fields) =>
        o.byte('{')
        fields.foreach { case (k, v) => lenStr(o, k); writeVal(k :: path, v) }
        o.byte('}')
      case JArray(ws) if path.headOption.contains("weights") =>
        f32Array(o, ws.map { case JDouble(d) => d; case JInt(i) => i.toDouble; case _ => 0.0 }.toArray)
      case other => writeJValue(o, other)
    }
    writeVal(Nil, doc)
    o.result()
  }
}
