package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal Motion-JPEG AVI (RIFF) container support, JDK-only — the
  * real video path for [[Multimodal.sampleFrames]]: an AVI is a RIFF
  * tree (`RIFF('AVI ' LIST('hdrl' avih strl) LIST('movi' 00dc...))`)
  * whose '00dc' chunks in the movi list are whole JPEG images, each
  * decodable by ImageIO. MJPEG is the one mainstream video codec a
  * bare JVM can demux AND decode; everything else still routes to the
  * documented stand-in.
  *
  * The writer emits spec-shaped avih/strh/strf headers (not just the
  * payload our reader needs) so the fixtures are genuine AVI files.
  * Reference for the container layout: the public AVI RIFF spec
  * (msdn AVI RIFF File Reference); no code was copied.
  */
object MjpegAvi {

  private val ASCII = "US-ASCII"

  /** Wrap JPEG-encoded frames into an MJPEG AVI. All frames must share
    * `width`×`height` (MJPEG requirement for the stream header).
    */
  def encode(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(jpegFrames.nonEmpty, "at least one frame")
    require(fps > 0, "fps must be positive") // 0 divides; <0 writes garbage headers
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      val b = ByteBuffer.allocate(8 + padded.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes(ASCII)).putInt(body.length).put(padded)
      b.array()
    }
    def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
      val payload = bodies.flatten.toArray
      val b = ByteBuffer.allocate(12 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes(ASCII)).putInt(4 + payload.length)
        .put(listType.getBytes(ASCII)).put(payload)
      b.array()
    }
    val usPerFrame = 1000000 / fps
    val maxFrame = jpegFrames.map(_.length).max
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame).putInt(maxFrame * fps).putInt(0)
        // flags 0: no idx1 chunk is written, so AVIF_HASINDEX (0x10)
        // must stay clear — an index-trusting parser would otherwise
        // seek a nonexistent idx1 (AVIF_ISINTERLEAVED is 0x100, also
        // not claimed)
        .putInt(0)
        .putInt(jpegFrames.length).putInt(0).putInt(1).putInt(maxFrame)
        .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
      chunk("avih", b.array())
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes(ASCII)).put("MJPG".getBytes(ASCII))
        .putInt(0).putShort(0.toShort).putShort(0.toShort).putInt(0)
        .putInt(1).putInt(fps) // scale / rate = fps
        .putInt(0).putInt(jpegFrames.length).putInt(maxFrame)
        .putInt(-1).putInt(0)
        .putShort(0.toShort).putShort(0.toShort)
        .putShort(width.toShort).putShort(height.toShort)
      chunk("strh", b.array())
    }
    val strf = { // BITMAPINFOHEADER
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
        .putShort(1.toShort).putShort(24.toShort)
        .put("MJPG".getBytes(ASCII)).putInt(width * height * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      chunk("strf", b.array())
    }
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", jpegFrames.map(chunk("00dc", _)): _*)
    val payload = hdrl ++ movi
    val out = ByteBuffer.allocate(12 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(ASCII)).putInt(4 + payload.length)
      .put("AVI ".getBytes(ASCII)).put(payload)
    out.array()
  }

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  /** Demux: every video frame chunk ('00dc'/'00db') inside the movi
    * list, in stream order. Tolerant single-pass chunk walk — no idx1
    * needed (the index is optional in the spec and our writer omits it).
    *
    * The walk is ITERATIVE with an explicit continuation stack, not
    * recursive: a nested LIST header costs only 12 input bytes, so a
    * crafted file could nest thousands deep — per-LIST recursion would
    * throw StackOverflowError (an Error no decode-path catch handles),
    * breaking the quarantine invariant that arbitrary bytes never kill
    * a task. Descending into a LIST pushes the after-the-list segment
    * and continues inside it, so frame order is preserved.
    */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (!isAvi(bytes)) return Seq.empty
    val out = Seq.newBuilder[Array[Byte]]
    def fourcc(off: Int): String =
      new String(bytes, off, 4, ASCII)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | (bytes(off + 1) & 0xffL) << 8 |
        (bytes(off + 2) & 0xffL) << 16 | (bytes(off + 3) & 0xffL) << 24
    val stack = scala.collection.mutable.Stack[(Int, Int, Boolean)]()
    stack.push((12, bytes.length, false))
    while (stack.nonEmpty) {
      var (p, end, inMovi) = stack.pop()
      var live = true
      while (live && p + 8 <= end) {
        val id = fourcc(p)
        val size = u32(p + 4) // unsigned: kept as Long so a corrupt
        val body = p + 8 //      0xFFFFFFxx field can't wrap negative
        if (size >= 0 && body + size <= end) {
          if (id == "LIST" && size >= 4) {
            // continue after this list once its interior is exhausted
            stack.push((body + size.toInt + (size.toInt & 1), end, inMovi))
            inMovi = inMovi || fourcc(body) == "movi"
            end = body + size.toInt
            p = body + 4
          } else {
            if (inMovi && (id == "00dc" || id == "00db") && size > 0)
              out += java.util.Arrays.copyOfRange(bytes, body, body + size.toInt)
            p = body + size.toInt + (size.toInt & 1) // even padding
          }
        } else {
          // corrupt size field: nothing after this chunk is walkable —
          // abandon this segment rather than loop forever or index
          // negative offsets (one bad file yields partial frames,
          // never a hung task); enclosing segments resume normally
          live = false
        }
      }
    }
    out.result()
  }
}
