package graft

import graft.queries.Mp4
import org.scalatest.funsuite.AnyFunSuite

/** The MP4 container tier's writer/parser pair (queries/Mp4.scala):
  * spec-shaped box trees, honest offsets, loud failures on malformed
  * bytes. */
class Mp4Spec extends AnyFunSuite {

  test("render emits a spec-shaped box tree; probe round-trips the metadata") {
    val payload = (0 until 300).map(_.toByte).toArray
    val bytes = Mp4.render(payload)
    val paths = Mp4.walk(bytes).map(_._1)
    // the full standard skeleton is present, in container nesting
    for (p <- Seq("ftyp", "moov", "moov/mvhd", "moov/trak",
        "moov/trak/tkhd", "moov/trak/mdia", "moov/trak/mdia/mdhd",
        "moov/trak/mdia/hdlr", "moov/trak/mdia/minf",
        "moov/trak/mdia/minf/smhd", "moov/trak/mdia/minf/dinf",
        "moov/trak/mdia/minf/stbl", "moov/trak/mdia/minf/stbl/stsd",
        "moov/trak/mdia/minf/stbl/stts", "moov/trak/mdia/minf/stbl/stsc",
        "moov/trak/mdia/minf/stbl/stsz", "moov/trak/mdia/minf/stbl/stco",
        "mdat"))
      assert(paths.contains(p), s"missing $p")
    val probe = Mp4.probe(bytes)
    assert(probe.nSamples == 300L && probe.mdatBytes == 300)
    assert(probe.mediaDuration == 300L && probe.mediaTimescale == 8000L)
    assert(probe.movieDuration == 300L * 1000 / 8000 &&
      probe.movieTimescale == 1000L)
    assert(probe.nTracks == 1 && probe.codec == "twos")
    assert(probe.firstByte == 0) // payload(0)
    // the stco offset points at the REAL payload: byte 37 of the
    // payload is value 37, readable straight through the probe's offset
    val stco = Mp4.walk(bytes).collectFirst {
      case (p, b) if p.endsWith("/stco") => b
    }.get
    val off = ((bytes(stco.offset + 8) & 0xff) << 24) |
      ((bytes(stco.offset + 9) & 0xff) << 16) |
      ((bytes(stco.offset + 10) & 0xff) << 8) |
      (bytes(stco.offset + 11) & 0xff)
    assert((bytes(off + 37) & 0xff) == 37)
  }

  test("top-level sizes tile the file exactly") {
    val bytes = Mp4.render("hello mp4".getBytes("UTF-8"))
    val top = Mp4.walk(bytes).filter(!_._1.contains("/"))
    assert(top.map(_._1) == Seq("ftyp", "moov", "mdat"))
    assert(top.map { case (_, b) => b.length + 8 }.sum == bytes.length)
  }

  test("malformed containers fail loudly, never parse silently") {
    val good = Mp4.render(Array[Byte](1, 2, 3))
    // truncated file
    intercept[IllegalArgumentException](Mp4.probe(good.dropRight(5)))
    // box size pointing past its container
    val overrun = good.clone()
    overrun(0) = 0x7f.toByte // ftyp size becomes enormous
    intercept[IllegalArgumentException](Mp4.probe(overrun))
    // a plausible-but-boxless byte soup
    intercept[IllegalArgumentException](
      Mp4.probe(Array.fill[Byte](64)(0x41)))
  }

  test("a zero-sample track with an empty trailing mdat fails typed") {
    // a foreign container can carry nSamples=0 and an empty mdat at
    // end-of-file: the stco bounds check passes (offset + 0 <= mdat
    // end) but there is no first byte to read — the failure must be
    // the typed IllegalArgumentException, not ArrayIndexOutOfBounds
    val empty = Mp4.render(Array.empty[Byte])
    val e = intercept[IllegalArgumentException](Mp4.probe(empty))
    assert(e.getMessage.contains("no sample data"))
  }
}
