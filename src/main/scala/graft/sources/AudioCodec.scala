package graft.sources

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

/** Real audio decode on the JDK's built-in codecs (javax.sound.sampled —
  * WAV/AIFF/AU with PCM payloads; part of java.desktop, no external
  * dependency). Compressed formats (mp3/ogg/aac) have no in-container
  * codec and stay on [[graft.operators.Multimodal.decodeStub]].
  */
object AudioCodec {

  final case class Pcm(sampleRate: Float, channels: Int,
      samples: Array[Float]) {
    /** Frames (samples per channel). */
    def frames: Int = samples.length / math.max(channels, 1)
  }

  /** Decode WAV/AIFF/AU bytes → interleaved samples normalized to [-1, 1].
    * None for null/undecodable/non-PCM payloads.
    */
  def decodePcm(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding.toString
        if (bits != 16 && bits != 8) return None
        if (enc != "PCM_SIGNED" && enc != "PCM_UNSIGNED") return None
        val raw = in.readAllBytes()
        val bytesPerSample = bits / 8
        val n = raw.length / bytesPerSample
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          val v =
            if (bits == 8) {
              if (enc == "PCM_UNSIGNED") ((raw(i) & 0xff) - 128) / 128.0f
              else raw(i) / 128.0f
            } else {
              val b0 = raw(i * 2)
              val b1 = raw(i * 2 + 1)
              val u =
                if (fmt.isBigEndian) ((b0 & 0xff) << 8) | (b1 & 0xff)
                else ((b1 & 0xff) << 8) | (b0 & 0xff)
              // unsigned 16-bit: silence is 0x8000, not 0 — recenter
              // before normalizing (the signed path would map it to -1.0)
              if (enc == "PCM_UNSIGNED") (u - 32768) / 32768.0f
              else u.toShort / 32768.0f
            }
          out(i) = v
          i += 1
        }
        Some(Pcm(fmt.getSampleRate, fmt.getChannels, out))
      } finally in.close()
    } catch {
      // NonFatal (not just the two checked exceptions): the JDK audio SPI
      // throws unchecked exceptions on corrupt headers/truncated frames;
      // undecodable payloads must keep SQL null semantics, not fail the task
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Encode mono float samples [-1, 1] as 16-bit little-endian PCM WAV. */
  def encodeWavMono16(sampleRate: Float,
      samples: Array[Float]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-1.0f, math.min(1.0f, samples(i)))
      val v = math.round(s * 32767.0f).toShort
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true,
      false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Per-clip audio features a pipeline filters on: duration, RMS energy,
    * zero-crossing rate (mono-mixed). Pure JVM math over the decoded PCM.
    */
  def features(pcm: Pcm): (Double, Double, Double) = {
    val ch = math.max(pcm.channels, 1)
    val frames = pcm.frames
    if (frames == 0) return (0.0, 0.0, 0.0)
    val mono = new Array[Float](frames)
    var f = 0
    while (f < frames) {
      var c = 0
      var acc = 0.0f
      while (c < ch) { acc += pcm.samples(f * ch + c); c += 1 }
      mono(f) = acc / ch
      f += 1
    }
    var sumSq = 0.0
    var crossings = 0
    var i = 0
    while (i < frames) {
      sumSq += mono(i).toDouble * mono(i)
      if (i > 0 && (mono(i) >= 0) != (mono(i - 1) >= 0)) crossings += 1
      i += 1
    }
    val duration = frames / pcm.sampleRate.toDouble
    val rms = math.sqrt(sumSq / frames)
    val zcr = if (frames > 1) crossings.toDouble / (frames - 1) else 0.0
    (duration, rms, zcr)
  }
}
