package graft.queries

/** Minimal, spec-shaped ISO base media file format (MP4) writer and
  * box-tree parser — the container layer of the video tier
  * (MultimodalOps.mp4Assets / q_mm_mp4_probe).
  *
  * Writer: emits `ftyp` + a complete `moov` (movie header, one track
  * with track/media headers, handler, sound media information and a
  * full sample table: description/times/chunk-map/sizes/offsets) +
  * `mdat` carrying the payload as 1-byte samples. Every box length is
  * computed bottom-up, the two duration fields are derived from the
  * sample count in their own timescales, and `stco`'s chunk offset is
  * the REAL absolute file offset of the payload (all moov boxes are
  * fixed-size, so the offset is computable before assembly).
  *
  * Parser: a genuine recursive box walk (size + fourcc headers,
  * descent into container boxes), not offset peeking — a probe answer
  * comes from finding `mvhd`/`mdhd`/`stsz`/`stsd`/`stco` wherever the
  * tree put them, validating sizes along the way. Malformed input
  * fails loudly.
  *
  * Public knowledge: box grammar and field layouts are from the
  * published ISO/IEC 14496-12 structure (also documented in countless
  * open parsers); no reference code involved.
  */
object Mp4 {

  import java.io.ByteArrayOutputStream

  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)

  private def box(fourcc: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(0)(_ + _.length)
    val out = new ByteArrayOutputStream(8 + body)
    out.write(be32(8 + body))
    out.write(fourcc.getBytes("US-ASCII"))
    payload.foreach(out.write)
    out.toByteArray
  }

  private val IdentityMatrix: Array[Byte] = {
    // 3×3 fixed-point unity matrix (u, v column 30-bit fixed)
    val m = new ByteArrayOutputStream(36)
    val rows = Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    rows.foreach(v => m.write(be32(v)))
    m.toByteArray
  }

  /** movie duration in mvhd units (milliseconds) for n samples */
  def movieDuration(nSamples: Int): Int =
    (nSamples.toLong * MultimodalOps.Mp4MovieTimescale /
      MultimodalOps.Mp4MediaTimescale).toInt

  /** render one payload as a complete MP4 container */
  def render(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val mediaDur = n // 1-byte samples in media timescale units
    val movieDur = movieDuration(n)

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))

    val mvhd = box("mvhd", be32(0) /* v0 */, be32(0), be32(0),
      be32(MultimodalOps.Mp4MovieTimescale), be32(movieDur),
      be32(0x00010000) /* rate */, be16(0x0100) /* volume */,
      new Array[Byte](10), IdentityMatrix, new Array[Byte](24),
      be32(2) /* next track id */)

    val tkhd = box("tkhd", be32(7) /* v0, flags: enabled|in-movie|preview */,
      be32(0), be32(0), be32(1) /* track id */, be32(0), be32(movieDur),
      new Array[Byte](8), be16(0), be16(0), be16(0x0100), be16(0),
      IdentityMatrix, be32(0) /* width */, be32(0) /* height */)

    val mdhd = box("mdhd", be32(0), be32(0), be32(0),
      be32(MultimodalOps.Mp4MediaTimescale), be32(mediaDur),
      be16(0x55c4) /* 'und' */, be16(0))

    val hdlr = box("hdlr", be32(0), be32(0),
      "soun".getBytes("US-ASCII"), new Array[Byte](12), Array[Byte](0))

    val smhd = box("smhd", be32(0), be16(0), be16(0))
    val dref = box("dref", be32(0), be32(1),
      box("url ", be32(1) /* self-contained */))
    val dinf = box("dinf", dref)

    // classic audio sample entry: 'twos' big-endian raw PCM, 1 channel,
    // 8-bit samples, media rate as 16.16 fixed
    val sampleEntry = box("twos", new Array[Byte](6), be16(1) /* dref idx */,
      new Array[Byte](8), be16(1) /* channels */, be16(8) /* bits */,
      be16(0), be16(0), be32(MultimodalOps.Mp4MediaTimescale << 16))
    val stsd = box("stsd", be32(0), be32(1), sampleEntry)
    val stts = box("stts", be32(0), be32(1), be32(n), be32(1))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(n), be32(1))
    val stsz = box("stsz", be32(0), be32(1) /* uniform 1-byte */, be32(n))
    // the absolute payload offset: every box above is fixed-size, so
    // the moov length is known without the offset — compute it from a
    // zero-offset assembly, then rebuild stco with the real value
    def assemble(chunkOffset: Int): Array[Byte] = {
      val stco = box("stco", be32(0), be32(1), be32(chunkOffset))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = box("minf", smhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      box("moov", mvhd, trak)
    }
    val moovLen = assemble(0).length
    val moov = assemble(ftyp.length + moovLen + 8)
    val mdat = box("mdat", payload)

    val out = new ByteArrayOutputStream(ftyp.length + moov.length + mdat.length)
    out.write(ftyp); out.write(moov); out.write(mdat)
    out.toByteArray
  }

  /** one parsed box: fourcc, absolute payload offset, payload length */
  final case class Box(fourcc: String, offset: Int, length: Int)

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl",
    "dinf", "edts", "udta")

  /** recursive box walk over [from, until); returns every box with its
    * PATH (e.g. "moov/trak/mdia/mdhd"). Fails loudly on malformed
    * sizes — truncated or overlapping boxes never parse silently. */
  def walk(bytes: Array[Byte], from: Int = 0, until: Int = -1,
      prefix: String = ""): Seq[(String, Box)] = {
    val end = if (until < 0) bytes.length else until
    val out = Seq.newBuilder[(String, Box)]
    var p = from
    while (p < end) {
      require(p + 8 <= end, s"truncated box header at $p")
      val size = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      val fourcc = new String(bytes, p + 4, 4, "US-ASCII")
      require(size >= 8 && p + size <= end,
        s"bad box size $size for '$fourcc' at $p (container end $end)")
      val path = if (prefix.isEmpty) fourcc else s"$prefix/$fourcc"
      out += path -> Box(fourcc, p + 8, size - 8)
      if (Containers(fourcc))
        out ++= walk(bytes, p + 8, p + size, path)
      p += size
    }
    out.result()
  }

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** probe result: the metadata a pipeline reads before any decode */
  final case class Probe(movieTimescale: Long, movieDuration: Long,
      mediaTimescale: Long, mediaDuration: Long, nTracks: Int,
      nSamples: Long, codec: String, mdatBytes: Int, firstByte: Int)

  /** parse a container and answer from the box tree (loud on absence) */
  def probe(bytes: Array[Byte]): Probe = {
    val boxes = walk(bytes)
    def one(path: String): Box = boxes.collectFirst {
      case (p, b) if p == path => b
    }.getOrElse(throw new IllegalArgumentException(s"no $path box"))
    val mvhd = one("moov/mvhd")
    val mdhd = one("moov/trak/mdia/mdhd")
    val stsz = one("moov/trak/mdia/minf/stbl/stsz")
    val stsd = one("moov/trak/mdia/minf/stbl/stsd")
    val stco = one("moov/trak/mdia/minf/stbl/stco")
    val mdat = one("mdat")
    val nTracks = boxes.count(_._1 == "moov/trak")
    val nSamples = u32(bytes, stsz.offset + 8)
    val codec = new String(bytes, stsd.offset + 8 + 4, 4, "US-ASCII")
    val chunkOffset = u32(bytes, stco.offset + 8).toInt
    require(chunkOffset >= mdat.offset &&
      chunkOffset + nSamples <= mdat.offset + mdat.length,
      s"stco offset $chunkOffset points outside mdat")
    // a zero-sample track with an empty mdat at end-of-file passes the
    // bounds check above but has no first byte to read — keep the
    // failure typed instead of an ArrayIndexOutOfBounds from bytes()
    require(nSamples >= 1 && chunkOffset < bytes.length,
      s"container has no sample data (nSamples=$nSamples, " +
        s"stco offset $chunkOffset, ${bytes.length} bytes)")
    Probe(
      movieTimescale = u32(bytes, mvhd.offset + 12),
      movieDuration = u32(bytes, mvhd.offset + 16),
      mediaTimescale = u32(bytes, mdhd.offset + 12),
      mediaDuration = u32(bytes, mdhd.offset + 16),
      nTracks = nTracks,
      nSamples = nSamples,
      codec = codec,
      mdatBytes = mdat.length,
      firstByte = bytes(chunkOffset) & 0xff)
  }
}
