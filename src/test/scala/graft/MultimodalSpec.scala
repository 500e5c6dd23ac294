package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal}

/** Pins the perceptual-hash image-dedup pipeline: dHash determinism and
  * bit-exact flip semantics on the planted patterns, the cross-pattern
  * Hamming margin `q_dedup_image`'s closed-form oracle relies on, poison
  * behavior, and the end-to-end decode→hash→block→cluster path.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash: planted flips move EXACTLY that many bits, noise moves none") {
    for (p <- 0 until 10) {
      val base = Multimodal.dHash64(Multimodal.syntheticPatternPng(p, 0, 1L)).get
      for (f <- 1 until 4) {
        val v = Multimodal.dHash64(Multimodal.syntheticPatternPng(p, f, 2L)).get
        assert(hamming(base, v) == f, s"pattern $p flips $f")
        // the flipped bits are column 0 of rows < f: bit indices 8*gy
        assert((base ^ v) == (0 until f).map(gy => 1L << (gy * 8)).reduce(_ | _))
      }
      // byte-level noise is mean-preserving: different bytes, same hash
      val n1 = Multimodal.syntheticPatternPng(p, 2, 11L)
      val n2 = Multimodal.syntheticPatternPng(p, 2, 12L)
      assert(!java.util.Arrays.equals(n1, n2))
      assert(Multimodal.dHash64(n1) == Multimodal.dHash64(n2))
    }
  }

  test("synthetic frames: noiseSeed acts only through mod 8 (memo-cache contract)") {
    // The frame memo caches key on (pattern, flips, seed mod 8); this is
    // sound because the noise pair's x-offset is the ONLY seed-dependent
    // pixel and it is computed mod 8. Pin both directions: congruent
    // seeds are byte-identical, non-congruent seeds differ.
    for (p <- Seq(0, 7); f <- Seq(0, 2)) {
      val a = Multimodal.syntheticPatternPng(p, f, 3L)
      assert(java.util.Arrays.equals(a, Multimodal.syntheticPatternPng(p, f, 11L)))
      assert(java.util.Arrays.equals(a, Multimodal.syntheticPatternPng(p, f, -5L))) // -5 ≡ 3 (mod 8)
      assert(!java.util.Arrays.equals(a, Multimodal.syntheticPatternPng(p, f, 4L)))
    }
    // cached arrays must be distinct objects per key, never clobbered:
    // a second call returns the SAME bytes (reference-stable is fine)
    val x = Multimodal.syntheticPatternPng(1, 1, 2L)
    assert(java.util.Arrays.equals(x, Multimodal.syntheticPatternPng(1, 1, 2L)))
  }

  test("dHash: cross-pattern margin clears the radius even after flips") {
    val flipMask = ~((0 until 3).map(gy => 1L << (gy * 8)).reduce(_ | _))
    val bases = (0 until 10).map(p =>
      Multimodal.dHash64(Multimodal.syntheticPatternPng(p, 0, 0L)).get)
    for (p <- 0 until 10; q <- (p + 1) until 10) {
      // variants may alter only the 3 flip bits on each side, so the
      // masked distance lower-bounds any variant pair across patterns;
      // it must clear maxHamming=3 with margin
      val masked = hamming(bases(p) & flipMask, bases(q) & flipMask)
      assert(masked > 6, s"patterns $p vs $q too close: masked hamming $masked")
    }
  }

  test("dHash: PNG re-encode keeps the hash bit-identical; poison rows are null") {
    val png = Multimodal.syntheticPatternPng(3, 1, 7L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.dHash64(bos.toByteArray) == Multimodal.dHash64(png))
    assert(Multimodal.dHash64(null).isEmpty)
    assert(Multimodal.dHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.dHash64("not an image".getBytes).isEmpty)
    // decodable but smaller than the 9x8 grid
    val tiny = {
      val i = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", b)
      b.toByteArray
    }
    assert(Multimodal.dHash64(tiny).isEmpty)
  }

  test("end to end: planted table clusters are exactly the pattern groups") {
    val ids = (0L until 120L).toDF("doc_id")
    val media = Multimodal.plantedImageTable(ids, patterns = 10)
    val hashes = Multimodal.imageHashes(media)
    val got = Dedup.hammingClusters(hashes, col("doc_id"), col("dhash"), maxHamming = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 120)
    for ((id, cluster) <- got) assert(cluster == id % 10, s"doc $id")
    // poison row joins as its own singleton
    val withPoison = hashes.unionByName(
      Seq((999L, None: Option[Long])).toDF("doc_id", "dhash"))
    val got2 = Dedup.hammingClusters(withPoison, col("doc_id"), col("dhash"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got2(999L) == 999L)
    assert(got2.size == 121)
  }

  test("canonical WAV fast paths are byte-identical to AudioSystem (both directions)") {
    // encode: wavFromPcm's hand-rolled 44-byte RIFF header must equal the
    // JDK WaveFileWriter's bytes exactly (the fast path exists to skip
    // AudioSystem's synchronized provider registry, not to change bytes)
    val pcm = Multimodal.tonePcm(3, 2, 7L)
    val mine = Multimodal.wavFromPcm(pcm)
    val viaJdk = {
      val bytes = new Array[Byte](pcm.length * 2)
      java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .asShortBuffer().put(pcm)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, pcm.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(java.util.Arrays.equals(mine, viaJdk))
    // decode: the canonical-WAV parse must yield the same samples the
    // AudioSystem path yields (here: via the full hash, which consumes
    // every sample) — and poison/unknown payloads still degrade safely
    for (p <- 0 until 10; f <- 0 until 4) {
      val wav = Multimodal.syntheticToneWav(p, f, p * 4L + f)
      val viaFast = Multimodal.decodePcm16Abs(wav).get
      val viaAis = {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wav))
        val raw = try ais.readAllBytes() finally ais.close()
        val n = raw.length / 2
        val buf = java.nio.ByteBuffer.wrap(raw)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
        Array.tabulate(n)(i => math.abs(buf.get(i).toLong))
      }
      assert(java.util.Arrays.equals(viaFast, viaAis), s"pattern $p flips $f")
    }
  }

  test("WAV fast path truncates to FRAME boundaries like AudioSystem (ADVICE r20)") {
    // stereo 16-bit WAV whose data chunk ends mid-frame (6 bytes = 1.5
    // frames of blockAlign 4): AudioSystem decodes exactly 1 frame; the
    // fast path must yield the same 2 samples, not 3
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val data = Array[Byte](10, 0, 20, 0, 30, 0) // 3 shorts, 1.5 stereo frames
    val out = new Array[Byte](44 + data.length)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(36 + data.length)
      .put("WAVE".getBytes(ascii))
      .put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1).putShort(2)      // integer PCM, STEREO
      .putInt(8000).putInt(8000 * 4)
      .putShort(4).putShort(16)     // blockAlign 4, 16-bit
      .put("data".getBytes(ascii)).putInt(data.length)
      .put(data)
    val viaFast = Multimodal.decodePcm16Abs(out).get
    val viaAis = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(out))
      val raw = try ais.readAllBytes() finally ais.close()
      val n = raw.length / 2
      val buf = java.nio.ByteBuffer.wrap(raw)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
      Array.tabulate(n)(i => math.abs(buf.get(i).toLong))
    }
    assert(java.util.Arrays.equals(viaFast, viaAis),
      s"fast=${viaFast.toSeq} ais=${viaAis.toSeq}")
    assert(viaFast.toSeq == Seq(10L, 20L))
  }

  test("cached-reader decode is pixel-identical to ImageIO.read (PNG and JPEG)") {
    // r21 per-thread reader cache: same pixels as the per-call
    // ImageIO.read path for both planted formats, and poison degrades
    def pixels(img: java.awt.image.BufferedImage): Seq[Int] =
      img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth).toSeq
    val png = Multimodal.syntheticPatternPng(4, 2, 11L)
    val jpg = {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(src, "jpg", bos)
      bos.toByteArray
    }
    for (bytes <- Seq(png, jpg)) {
      val viaCache = Multimodal.readImage(bytes)
      val viaImageIO = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(pixels(viaCache) == pixels(viaImageIO))
      // a second decode through the SAME cached reader stays identical
      assert(pixels(Multimodal.readImage(bytes)) == pixels(viaImageIO))
    }
    assert(Multimodal.readImage(null) == null)
    assert(Multimodal.readImage(Array[Byte](1, 2, 3)) == null)
    assert(Multimodal.readImage("nonsense-bytes-here".getBytes) == null)
    // a poison JPEG (valid magic, truncated body) degrades without
    // poisoning the cached reader for the NEXT good payload
    assert(Multimodal.readImage(jpg.take(20)) == null)
    assert(pixels(Multimodal.readImage(jpg)) ==
      pixels(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))))
  }

  test("audioHash: planted flips move exactly those bits, noise moves none") {
    for (p <- 0 until 10) {
      val base = Multimodal.audioHash64(Multimodal.syntheticToneWav(p, 0, 1L)).get
      for (f <- 1 until 4) {
        val v = Multimodal.audioHash64(Multimodal.syntheticToneWav(p, f, 2L)).get
        assert(hamming(base, v) == f, s"pattern $p flips $f")
        // the flipped bits are the slot bits 3k+1 for k < f
        assert((base ^ v) == (0 until f).map(k => 1L << (3 * k + 1)).reduce(_ | _))
      }
      // energy-exact byte noise: different bytes, identical hash
      val n1 = Multimodal.syntheticToneWav(p, 2, 11L)
      val n2 = Multimodal.syntheticToneWav(p, 2, 12L)
      assert(!java.util.Arrays.equals(n1, n2))
      assert(Multimodal.audioHash64(n1) == Multimodal.audioHash64(n2))
    }
  }

  test("audioHash: cross-pattern margin; poison rows are null") {
    val flipMask = ~((0 until 3).map(k => 1L << (3 * k + 1)).reduce(_ | _))
    val bases = (0 until 10).map(p =>
      Multimodal.audioHash64(Multimodal.syntheticToneWav(p, 0, 0L)).get)
    for (p <- 0 until 10; q <- (p + 1) until 10) {
      val masked = hamming(bases(p) & flipMask, bases(q) & flipMask)
      assert(masked > 6, s"patterns $p vs $q too close: masked hamming $masked")
    }
    assert(Multimodal.audioHash64(null).isEmpty)
    assert(Multimodal.audioHash64("not audio".getBytes).isEmpty)
    assert(Multimodal.audioHash64(Array[Byte](82, 73, 70, 70)).isEmpty) // truncated RIFF
  }

  test("audio end to end: planted clusters are exactly the pattern groups") {
    val ids = (0L until 80L).toDF("doc_id")
    val media = Multimodal.plantedAudioTable(ids, patterns = 10)
    val got = Dedup.hammingClusters(Multimodal.audioHashes(media),
        col("doc_id"), col("ahash"), maxHamming = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 80)
    for ((id, cluster) <- got) assert(cluster == id % 10, s"doc $id")
  }

  test("hammingClusters: exact-duplicate signatures collapse before blocking") {
    // 1000 identical signatures + one 2-bit neighbor: no quadratic chunk
    // flood (reps = 2 rows), every member lands in one cluster
    val sigs = (0L until 1000L).map(i => (i, 0xABCDEF0123456789L))
      .toDF("doc_id", "sig")
      .unionByName(Seq((5000L, 0xABCDEF0123456789L ^ 3L)).toDF("doc_id", "sig"))
    val got = Dedup.hammingClusters(sigs, col("doc_id"), col("sig"), maxHamming = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 1001)
    assert(got.values.toSet == Set(0L))
  }

  test("videoHash: every (pattern, flips) clip decodes to the closed-form hash") {
    // THE JPEG-robustness pin: frames are lossy JPEGs, but the no-tie
    // cell margins (>= 25 grays vs ~1-3 grays of DCT-aligned
    // quantization error) make every dHash comparison land exactly on
    // the integer closed form — for all 40 planted (pattern, flips)
    // combinations, so q_dedup_video's oracle can replay clustering
    // without decoding a frame
    for (p <- 0 until 10; f <- 0 until 4) {
      val clip = Multimodal.syntheticMjpegAvi(p, f, noiseSeed = p * 100L + f)
      assert(Multimodal.videoHash64(clip).contains(Multimodal.expectedVideoHash(p, f)),
        s"pattern $p flips $f diverged from closed form")
    }
  }

  test("videoHash: flips move exactly those bits; noise moves none; margins hold") {
    for (p <- 0 until 10) {
      val base = Multimodal.expectedVideoHash(p, 0)
      for (f <- 1 until 4)
        assert((base ^ Multimodal.expectedVideoHash(p, f)) ==
          (0 until f).map(gy => 1L << (gy * 8)).reduce(_ | _), s"pattern $p flips $f")
      // byte-level per-frame noise: different container bytes, same hash
      val c1 = Multimodal.syntheticMjpegAvi(p, 2, 101L)
      val c2 = Multimodal.syntheticMjpegAvi(p, 2, 202L)
      assert(!java.util.Arrays.equals(c1, c2))
      assert(Multimodal.videoHash64(c1) == Multimodal.videoHash64(c2))
    }
    // cross-pattern margin outside the flip-bit mask clears the radius
    val flipMask = ~((0 until 3).map(gy => 1L << (gy * 8)).reduce(_ | _))
    val bases = (0 until 10).map(p => Multimodal.expectedVideoHash(p, 0))
    for (p <- 0 until 10; q <- (p + 1) until 10) {
      val masked = hamming(bases(p) & flipMask, bases(q) & flipMask)
      assert(masked > 6, s"patterns $p vs $q too close: masked hamming $masked")
    }
  }

  test("videoHash: poison rows are null, never failing the task") {
    assert(Multimodal.videoHash64(null).isEmpty)
    assert(Multimodal.videoHash64("not a riff container".getBytes("UTF-8")).isEmpty)
    // a RIFF/AVI wrapper whose frames are garbage decodes zero frames -> null
    val junkFrames = Multimodal.buildMjpegAvi(
      Seq("junk1".getBytes("UTF-8"), "junk2".getBytes("UTF-8")), 72, 64, 500000L)
    assert(Multimodal.videoHash64(junkFrames).isEmpty)
    // truncated container: parser must bail cleanly
    val good = Multimodal.syntheticMjpegAvi(1, 0, 1L)
    assert(Multimodal.videoHash64(java.util.Arrays.copyOf(good, good.length / 3)).isEmpty)
  }

  test("mixed-stream AVI: only the MJPG stream's chunks decode as frames") {
    // ADVICE r16: the mjpeg flag was container-global — a file with an
    // MJPG vids stream PLUS a second codec'd video stream emitted the
    // second stream's ..dc chunks as decodable frame bytes. The walk
    // must bind frames to the declaring stream's 2-digit chunk prefix.
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      cc(id) ++ le32(payload.length.toLong) ++ payload ++ pad
    }
    def list(t: String, body: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le32(body.length + 4L) ++ cc(t) ++ body
    def strl(codec: String): Array[Byte] = {
      val strh = cc("vids") ++ cc(codec) ++ Array.fill(48)(0.toByte)
      list("strl", chunk("strh", strh))
    }
    def avi(avihPayload: Array[Byte], strls: Seq[Array[Byte]],
        movi: Seq[(String, Array[Byte])]): Array[Byte] = {
      val hdrl = list("hdrl",
        chunk("avih", avihPayload) ++ strls.foldLeft(Array.emptyByteArray)(_ ++ _))
      val m = list("movi",
        movi.map { case (id, b) => chunk(id, b) }.foldLeft(Array.emptyByteArray)(_ ++ _))
      val body = cc("AVI ") ++ hdrl ++ m
      cc("RIFF") ++ le32(body.length.toLong) ++ body
    }
    val avih = le32(500000L) ++ Array.fill(52)(0.toByte) // full 14-dword avih
    // a real decodable JPEG frame vs codec garbage
    val jpeg = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val garbage = Array.fill(64)(0x5a.toByte)

    // MJPG is stream 0: only 00dc rides out
    val mixed0 = avi(avih, Seq(strl("MJPG"), strl("XVID")),
      Seq("00dc" -> jpeg, "01dc" -> garbage))
    val f0 = Multimodal.aviMjpegFrames(mixed0)
    assert(f0.exists(_._2.map(_.toSeq) == IndexedSeq(jpeg.toSeq)),
      "stream-0 MJPG must emit exactly its own chunk")
    // MJPG is stream 1: only 01dc rides out
    val mixed1 = avi(avih, Seq(strl("XVID"), strl("MJPG")),
      Seq("00dc" -> garbage, "01dc" -> jpeg))
    val f1 = Multimodal.aviMjpegFrames(mixed1)
    assert(f1.exists(_._2.map(_.toSeq) == IndexedSeq(jpeg.toSeq)),
      "stream-1 MJPG must emit exactly its own chunk")
    // no MJPG stream at all: no frames, whatever chunks exist
    val none = avi(avih, Seq(strl("XVID")), Seq("00dc" -> garbage))
    assert(Multimodal.aviMjpegFrames(none).isEmpty)

    // ADVICE r16 #5: a short avih (size in [4,20)) still yields
    // usPerFrame for the timed grid — only dwTotalFrames needs 20 bytes
    val shortAvih = avi(le32(250000L), Seq(strl("XVID")), Seq("00dc" -> garbage))
    assert(Multimodal.aviTimedGrid(shortAvih).contains((250000L, 1L)))
  }

  test("clipContainment: hand-built sequences, alignments, both-direction equality") {
    // generic over any (doc_id, frame_idx, hash) table — integers here
    val frames = Seq(
      (1L, 0, 5L), (1L, 1, 5L), (1L, 2, 7L),                      // [5,5,7]
      (2L, 0, 9L), (2L, 1, 5L), (2L, 2, 5L), (2L, 3, 7L), (2L, 4, 3L), // [9,5,5,7,3]
      (3L, 0, 5L), (3L, 1, 5L), (3L, 2, 7L),                      // [5,5,7] == doc 1
      (4L, 0, 5L), (4L, 1, 7L), (4L, 2, 3L),                      // [5,7,3]
      (5L, 0, 2L), (5L, 1, 2L), (5L, 2, 2L), (5L, 3, 2L),         // [2,2,2,2]
      (6L, 0, 2L), (6L, 1, 2L), (6L, 2, 2L)                       // [2,2,2]
    ).toDF("doc_id", "frame_idx", "fhash")
    val got = Multimodal.clipContainment(frames, minFrames = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1L), (3L, 2L, 1L), // short inside the compilation, aligned
      (1L, 3L, 0L), (3L, 1L, 0L), // equal sequences qualify both ways
      (4L, 2L, 2L),               // tail run
      (6L, 5L, 0L)                // repeated-hash run: FIRST position wins
    ), s"got $got")
  }

  test("clipContainmentGroups: rep edges + member counts; expansion reproduces the pair surface") {
    // Same hand-built table as the pair test: groups are {1,3} (seq
    // [5,5,7], rep 1), {2}, {4}, {5}, {6}. Group output must be LINEAR
    // in distinct sequences: one self edge per group (equal sequences)
    // plus the cross containment edges, each carrying member counts.
    val frames = Seq(
      (1L, 0, 5L), (1L, 1, 5L), (1L, 2, 7L),
      (2L, 0, 9L), (2L, 1, 5L), (2L, 2, 5L), (2L, 3, 7L), (2L, 4, 3L),
      (3L, 0, 5L), (3L, 1, 5L), (3L, 2, 7L),
      (4L, 0, 5L), (4L, 1, 7L), (4L, 2, 3L),
      (5L, 0, 2L), (5L, 1, 2L), (5L, 2, 2L), (5L, 3, 2L),
      (6L, 0, 2L), (6L, 1, 2L), (6L, 2, 2L)
    ).toDF("doc_id", "frame_idx", "fhash")
    val got = Multimodal.clipContainmentGroups(frames, minFrames = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0L, 2L, 2L), (2L, 2L, 0L, 1L, 1L), (4L, 4L, 0L, 1L, 1L),
      (5L, 5L, 0L, 1L, 1L), (6L, 6L, 0L, 1L, 1L), // self edges, all groups
      (1L, 2L, 1L, 2L, 1L),                       // [5,5,7] inside doc 2
      (4L, 2L, 2L, 1L, 1L),                       // tail run
      (6L, 5L, 0L, 1L, 1L)                        // repeated-hash run
    ), s"got $got")
    // the member map + group edges EXPAND to exactly clipContainment's
    // member-level pairs (self edges -> ordered distinct member pairs)
    val memberMap = Multimodal.containmentMembers(frames, minFrames = 3)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expanded = (for {
      (ir, or, at, _, _) <- got.toSeq
      i <- memberMap(ir); o <- memberMap(or) if i != o
    } yield (i, o, at)).toSet
    val pairs = Multimodal.clipContainment(frames, minFrames = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(expanded == pairs, s"missing=${pairs -- expanded} extra=${expanded -- pairs}")
  }

  test("persist-first idiom: ONE decode pass feeds groups AND members (VERDICT r18 #6)") {
    // The canonical consumer pattern for the groups+members pairing:
    // clipContainmentGroups and containmentMembers each evaluate their
    // input once (each call runs containmentCore), so a LIVE decode plan
    // would decode twice — persist `frames` first and both calls read
    // the cached rows. The accumulator-counting stand-in decode proves
    // it: after the persist-materializing count, neither call adds a
    // single re-decode.
    val decodes = spark.sparkContext.longAccumulator("decodes")
    val fakeDecode = udf { (h: Long) => decodes.add(1L); h }
    val raw = Seq(
      (1L, 0, 5L), (1L, 1, 5L), (1L, 2, 7L),
      (2L, 0, 9L), (2L, 1, 5L), (2L, 2, 5L), (2L, 3, 7L), (2L, 4, 3L),
      (3L, 0, 5L), (3L, 1, 5L), (3L, 2, 7L)
    ).toDF("doc_id", "frame_idx", "raw")
    val frames = raw
      .select(col("doc_id"), col("frame_idx"), fakeDecode(col("raw")).as("fhash"))
      .persist()
    frames.count() // the one decode pass
    val decodedOnce = decodes.value
    // >= not ==: accumulator updates double-count on task retry (ADVICE
    // r19), so pinning the absolute count makes any retry/speculative
    // run flaky. The property under test is ZERO re-decodes AFTER the
    // materializing pass, asserted below against this baseline.
    assert(decodedOnce >= 11L, s"expected >= 11 decodes, got $decodedOnce")
    val groups = Multimodal.clipContainmentGroups(frames, minFrames = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val memberMap = Multimodal.containmentMembers(frames, minFrames = 3)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    frames.unpersist()
    assert(decodes.value == decodedOnce,
      s"persist-first must serve both consumers from cache: " +
        s"${decodes.value - decodedOnce} re-decodes")
    // and the pairing is consistent: groups expand through the member
    // map to the pair surface's member-level edges
    val expanded = (for {
      (ir, or, at, _, _) <- groups.toSeq
      i <- memberMap(ir); o <- memberMap(or) if i != o
    } yield (i, o, at)).toSet
    assert(expanded == Set((1L, 2L, 1L), (3L, 2L, 1L), (1L, 3L, 0L), (3L, 1L, 0L)))
  }

  test("video end to end: planted clip containment equals the id-arithmetic truth") {
    val ids = (0L until 45L).toDF("doc_id")
    val media = Multimodal.plantedClipTable(ids, patterns = 10)
    val frames = Multimodal.videoFrameHashes(media)
    val got = Multimodal.clipContainment(frames, minFrames = 3)
      .as[(Long, Long, Long)].collect().toSet
    def short(id: Long) = id % 3 == 0
    val idsSeq = 0L until 45L
    val expected = (for {
      a <- idsSeq; b <- idsSeq if a != b
      hit <- {
        if (short(a) && short(b) && a % 10 == b % 10) Some(0L)
        else if (short(a) && !short(b) && a % 10 == b % 10) Some(0L)
        else if (short(a) && !short(b) && a % 10 == (b + 1) % 10) Some(3L)
        else if (!short(a) && !short(b) && a % 10 == b % 10) Some(0L)
        else None
      }
    } yield (a, b, hit)).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("video end to end: planted clusters are exactly the pattern groups") {
    val ids = (0L until 60L).toDF("doc_id")
    val media = Multimodal.plantedVideoTable(ids, patterns = 10)
    val hashes = Multimodal.videoHashes(media)
    val got = Dedup.hammingClusters(hashes, col("doc_id"), col("vhash"), maxHamming = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 60)
    for ((id, cl) <- got) assert(cl == id % 10, s"doc $id in cluster $cl")
  }
}
