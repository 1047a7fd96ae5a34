package graft.multimodal

import graft.SparkSpec

/** Acoustic fingerprint: invariance under the re-encoding family
  * (rate / bit depth / gain / container), separation of distinct
  * content, and the shared hamming-banded near-dup plan. */
class AudioFingerprintSpec extends SparkSpec {

  test("identical bytes fingerprint identically; determinism across calls") {
    val b = AudioFingerprint.toneClipWav(42L, 16000, 16, 0.9)
    val h1 = AudioFingerprint.fingerprint64(b)
    val h2 = AudioFingerprint.fingerprint64(b.clone())
    assert(h1 != null && h1 == h2)
  }

  test("re-encoding keeps the fingerprint close; distinct content stays far") {
    val ids = Seq(3L, 17L, 88L, 190L, 777L)
    val hashes = ids.map { id =>
      val orig = AudioFingerprint.fingerprint64(
        AudioFingerprint.toneClipWav(id, 22050, 16, 0.9))
      // the full re-encoding family at once: half rate, 8-bit, -8 dB
      val re = AudioFingerprint.fingerprint64(
        AudioFingerprint.toneClipWav(id, 11025, 8, 0.35))
      assert(orig != null && re != null)
      val d = java.lang.Long.bitCount(orig ^ re)
      assert(d <= 4, s"id $id: re-encode moved the fingerprint $d bits")
      id -> orig
    }.toMap
    for (a <- ids; b <- ids if a < b) {
      val d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      assert(d > 12, s"distinct clips $a/$b only $d bits apart")
    }
  }

  test("FLAC re-encode of the same recording fingerprints within 2 bits of the WAV") {
    val wav = AudioFingerprint.toneClipWav(55L, 16000, 16, 0.8)
    val Some((samples, rate)) = AudioFingerprint.pcmMono(wav)
    val ints = samples.map(s => math.max(-32768, math.min(32767, (s * 32767.0).round.toInt)))
    val flac = Flac.encode(Array(ints), rate)
    val hWav = AudioFingerprint.fingerprint64(wav)
    val hFlac = AudioFingerprint.fingerprint64(flac)
    assert(hFlac != null)
    val d = java.lang.Long.bitCount(hWav ^ hFlac)
    assert(d <= 2, s"container change moved the fingerprint $d bits")
  }

  test("undecodable payloads fingerprint to null, never throw") {
    assert(AudioFingerprint.fingerprint64(null: Array[Byte]) == null)
    assert(AudioFingerprint.fingerprint64("not audio".getBytes("UTF-8")) == null)
    assert(AudioFingerprint.fingerprint64(Array[Byte](1, 2, 3)) == null)
  }

  test("clips shorter than one analysis frame still fingerprint (zero-padded)") {
    val short = AudioFingerprint.toneClipWav(9L, 16000, 16, 0.9, durationMs = 100)
    assert(AudioFingerprint.fingerprint64(short) != null)
  }

  test("nearDups finds re-encoded copies across a media table and nothing else; samples never shuffle") {
    import spark.implicits._
    // 10 distinct clips; every 3rd gets a half-rate 8-bit re-encode at id+1000
    val rows = (0 until 10).flatMap { i =>
      val orig = (100L + i, AudioFingerprint.toneClipWav(100L + i, 22050, 16, 0.9))
      if (i % 3 == 0)
        Seq(orig, (1100L + i, AudioFingerprint.toneClipWav(100L + i, 11025, 8, 0.4)))
      else Seq(orig)
    } :+ ((9999L, "junk bytes, not audio".getBytes("UTF-8")))
    val media = rows.toDF("media_id", "content")
    val pairs = AudioFingerprint.nearDups(media, maxHamming = 4)
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 10).filter(_ % 3 == 0).map(i => (100L + i, 1100L + i)).toSet
    assert(got == expected, s"expected $expected, got $got")
    assert(pairs.select("hamming").collect().forall(_.getInt(0) <= 4))
  }

  test("8-bit AIFF (signed PCM) fingerprints with its 16-bit WAV twin") {
    import javax.sound.sampled._
    // decode the WAV, re-encode the same samples as signed 8-bit AIFF
    // via javax.sound itself — the decoder must honor PCM_SIGNED for
    // 8-bit (treating it as unsigned adds a +2.0 step on negatives
    // and scrambles the spectrum)
    val wav = AudioFingerprint.toneClipWav(21L, 16000, 16, 0.8)
    val Some((samples, rate)) = AudioFingerprint.pcmMono(wav)
    val signed8 = samples.map(s => math.max(-128, math.min(127, (s * 127.0).round.toInt)).toByte)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 8, 1, 1, rate, true)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(signed8), fmt, signed8.length)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    val aiff = bos.toByteArray
    val d = java.lang.Long.bitCount(
      AudioFingerprint.fingerprint64(wav) ^ AudioFingerprint.fingerprint64(aiff))
    assert(d <= 4, s"signed 8-bit AIFF moved the fingerprint $d bits")
  }

  test("ultrasonic content does not alias into the band grid on decimation") {
    // the same band tones at 44.1 kHz, once clean and once with a
    // strong 5.5 kHz tone on top (above the 4 kHz analysis Nyquist):
    // without an anti-alias low-pass the 5.5 kHz tone folds to
    // 2.5 kHz — squarely inside the band grid — and flips band-order
    // bits the clean clip doesn't have
    def withUltrasonic(id: Long, amp: Double): Array[Byte] = {
      val clean = AudioFingerprint.toneClipWav(id, 44100, 16, 0.5)
      val Some((samples, rate)) = AudioFingerprint.pcmMono(clean)
      val spiked = samples.zipWithIndex.map { case (s, j) =>
        s + amp * math.sin(2 * math.Pi * 5500.0 * j / rate)
      }
      val peak = spiked.map(math.abs).max
      val ints = spiked.map(s => (s / peak * 0.9 * 32767.0).round.toInt)
      Flac.encode(Array(ints), rate)
    }
    val clean = AudioFingerprint.fingerprint64(AudioFingerprint.toneClipWav(66L, 44100, 16, 0.5))
    val spiked = AudioFingerprint.fingerprint64(withUltrasonic(66L, 0.5))
    val d = java.lang.Long.bitCount(clean ^ spiked)
    assert(d <= 4, s"ultrasonic tone aliased into the fingerprint: $d bits moved")
  }

  test("rates below the band grid's Nyquist need return null, not a never-matching hash") {
    val low = AudioFingerprint.toneClipWav(7L, 6000, 16, 0.9)
    assert(AudioFingerprint.fingerprint64(low) == null)
  }

  test("exact-copy mass duplication pre-groups into stars (hamming 0)") {
    import spark.implicits._
    val b = AudioFingerprint.toneClipWav(5L, 16000, 16, 0.9)
    val media = (0 until 6).map(i => (i.toLong, b)).toDF("media_id", "content")
    val pairs = AudioFingerprint.nearDups(media, maxHamming = 4).collect()
    assert(pairs.length == 5)
    assert(pairs.forall(r => r.getAs[Long]("id_a") == 0L && r.getAs[Int]("hamming") == 0))
  }
}
