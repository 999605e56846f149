package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Avi, Jpeg}

class AviSpec extends AnyFunSuite {

  private def grayFrame(w: Int, h: Int, seed: Int): Array[Byte] =
    Jpeg.encodeGray(Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      (bx * 19 + by * 7 + seed) % 256
    }, w, h)

  test("writer/parser round-trip preserves frames, dimensions and fps") {
    val frames = (0 until 5).map(f => grayFrame(16, 8, 40 + 13 * f))
    val bytes = Avi.writeAvi(frames, 16, 8, 25)
    val v = Avi.parseAvi(bytes)
    assert(v.width == 16 && v.height == 8)
    assert(v.fps == 25.0)
    assert(v.frames.length == 5)
    v.frames.zip(frames).foreach { case (got, want) =>
      assert(got.sameElements(want), "frame bytes differ after container round-trip")
    }
  }

  test("odd-length frames honor RIFF even-byte padding") {
    // force an odd payload by appending a comment segment of odd length
    val base = grayFrame(8, 8, 3)
    val odd =
      if (base.length % 2 == 1) base
      else base ++ Array[Byte](0) // tail bytes after EOI are ignored by the decoder
    assert(odd.length % 2 == 1)
    val frames = Seq(odd, grayFrame(8, 8, 9), odd)
    val v = Avi.parseAvi(Avi.writeAvi(frames, 8, 8, 10))
    assert(v.frames.length == 3)
    assert(v.frames(0).sameElements(odd) && v.frames(2).sameElements(odd))
    // sampled decode still works on the padded frames
    assert(Avi.sampleFrames(Avi.writeAvi(frames, 8, 8, 10), 1).length == 3)
  }

  test("sampleFrames strides over the chunk index and decodes bit-exactly") {
    val id = 5L // 4+5%4 = 5 frames, bw = 2+5%3 = 4 → 32x8
    val sampled = Avi.sampleFrames(Avi.aviFixture(id), 2)
    assert(sampled.map(_._1) == Seq(0, 2, 4))
    sampled.foreach { case (idx, f) =>
      assert(f.width == 32 && f.height == 8)
      val want = (0 until 4).map(bx => (bx * 31 + 5 * id + 11 * idx) % 256).sum.toDouble / 4
      assert(f.meanR == want, s"frame $idx")
    }
  }

  test("fixture closed form holds across ids") {
    (0L until 12L).foreach { id =>
      val v = Avi.parseAvi(Avi.aviFixture(id))
      val bw = (2 + id % 3).toInt
      assert(v.width == 8 * bw && v.height == 8)
      assert(v.frames.length == (4 + id % 4).toInt)
      assert(v.fps == 1e6 / (1000000 / (10 + id % 5).toInt))
      v.frames.zipWithIndex.foreach { case (fr, f) =>
        val info = Jpeg.decodeFeatures(fr)
        val want = (0 until bw).map(bx => (bx * 31 + 5 * id + 11 * f) % 256).sum.toDouble / bw
        assert(info.meanR == want, s"id=$id frame=$f")
      }
    }
  }

  test("corrupt streams are rejected loudly") {
    intercept[IllegalArgumentException](Avi.parseAvi(Array[Byte](1, 2, 3)))
    val ok = Avi.aviFixture(0L)
    // truncate inside the movi list: the chunk walk must notice the overrun
    intercept[Exception](Avi.parseAvi(java.util.Arrays.copyOf(ok, ok.length - 10)))
  }
}
