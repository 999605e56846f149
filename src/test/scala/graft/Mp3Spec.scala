package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Mp3

class Mp3Spec extends AnyFunSuite {

  test("fixture parses to its closed-form metadata") {
    (0L until 20L).foreach { id =>
      val m = Mp3.parse(Mp3.mp3Fixture(id))
      val br = Array(128, 160, 192, 224, 256)((id % 5).toInt)
      val sr = Array(44100, 48000, 32000)((id % 3).toInt)
      val n = (5 + id % 6).toInt
      assert(m.sampleRate == sr && m.nFrames == n && m.isCbr)
      assert(m.avgBitrateKbps == br.toDouble)
      assert(math.abs(m.durationMs - n * 1152000.0 / sr) < 1e-9)
    }
  }

  test("padding bit changes the frame stride") {
    // hand-build two frames: first padded, second not — parser must step
    // over the extra byte exactly
    val br = 128; val sr = 44100
    val brIdx = 9; val srIdx = 0 // 128 kbps, 44.1 kHz
    def frame(padding: Int): Array[Byte] = {
      val f = new Array[Byte](Mp3.frameLength(br, sr, padding))
      f(0) = 0xff.toByte; f(1) = 0xfa.toByte
      f(2) = ((brIdx << 4) | (srIdx << 2) | (padding << 1)).toByte
      f
    }
    val m = Mp3.parse(frame(1) ++ frame(0))
    assert(m.nFrames == 2 && m.isCbr)
  }

  test("VBR stream: mixed bitrates detected, average weighted by frame") {
    val sr = 44100; val srIdx = 0
    def frame(brIdx: Int, br: Int): Array[Byte] = {
      val f = new Array[Byte](Mp3.frameLength(br, sr, 0))
      f(0) = 0xff.toByte; f(1) = 0xfa.toByte
      f(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      f
    }
    val m = Mp3.parse(frame(9, 128) ++ frame(14, 320) ++ frame(9, 128))
    assert(!m.isCbr)
    assert(math.abs(m.avgBitrateKbps - (128 + 320 + 128) / 3.0) < 1e-9)
  }

  test("ID3v2 tag is skipped via its syncsafe size") {
    val bare = Mp3.mp3Fixture(1L)
    // the fixture already carries an ID3 tag; strip it and re-parse
    val stripped = java.util.Arrays.copyOfRange(bare, 30, bare.length)
    val a = Mp3.parse(bare); val b = Mp3.parse(stripped)
    assert(a == b)
  }

  test("corrupt and unsupported streams are rejected loudly") {
    intercept[IllegalArgumentException](Mp3.parse(Array[Byte](1, 2, 3, 4)))
    // MPEG2 version bits
    val f = Mp3.mp3Fixture(0L)
    f(30 + 1) = 0xf2.toByte // version bits = 10 (MPEG2)
    intercept[IllegalArgumentException](Mp3.parse(f))
    // truncated mid-HEADER: the 5th frame's header is cut after the sync
    // bytes and backfilled with zeros → bitrate index 0 ("free") rejects
    val g = Mp3.mp3Fixture(0L)
    val cut = 30 + 4 * Mp3.frameLength(128, 44100, 0) + 2
    intercept[IllegalArgumentException](
      Mp3.parse(java.util.Arrays.copyOf(g, cut) ++ Array[Byte](0, 0, 0, 0)))
  }
}
