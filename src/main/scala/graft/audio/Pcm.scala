package graft.audio

import java.nio.{ByteBuffer, ByteOrder}

/** Hand-rolled PCM16 little-endian codec + SNR math — zero external deps.
  *
  * The synthetic `bytes` column is PCM16LE mono. The per-row invariant from
  * `BASELINE.json` input_hint is "decoded-PCM allclose (SNR >= 30 dB)" vs the
  * reference row; this module supplies decode + SNR. (The reference repo has
  * no audio; its analogous per-row equality is payload equality between
  * staging copies, `src/app2/experiments/stg_copy.py:47-97`.)
  */
object Pcm {

  /** Encode int16 samples as little-endian PCM bytes. */
  def encode(samples: Array[Short]): Array[Byte] = {
    val bb = ByteBuffer.allocate(samples.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Decode little-endian PCM16 bytes to int16 samples (truncates odd tail). */
  def decode(bytes: Array[Byte]): Array[Short] = {
    val n = bytes.length / 2
    val out = new Array[Short](n)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { out(i) = bb.getShort(i * 2); i += 1 }
    out
  }

  /** Deterministic sine+harmonic test signal, int16, amplitude < 0.5 FS. */
  def synthSignal(srHz: Int, durMs: Int, freqHz: Double, phase: Double): Array[Short] = {
    val n = (srHz.toLong * durMs / 1000L).toInt
    val out = new Array[Short](n)
    val w = 2.0 * math.Pi * freqHz / srHz
    var i = 0
    while (i < n) {
      val v = 0.35 * math.sin(w * i + phase) + 0.12 * math.sin(2.5 * w * i)
      out(i) = (v * 32767.0).toShort
      i += 1
    }
    out
  }

  /** SNR in dB of candidate vs reference PCM. Identical signals → +Inf.
    * Length mismatch or empty reference → -Inf (always a violation).
    */
  def snrDb(ref: Array[Short], cand: Array[Short]): Double = {
    if (ref.length != cand.length || ref.length == 0) return Double.NegativeInfinity
    var sig = 0.0
    var noise = 0.0
    var i = 0
    while (i < ref.length) {
      val r = ref(i).toDouble
      val d = r - cand(i).toDouble
      sig += r * r
      noise += d * d
      i += 1
    }
    if (noise == 0.0) Double.PositiveInfinity
    else if (sig == 0.0) Double.NegativeInfinity
    else 10.0 * math.log10(sig / noise)
  }

  /** SNR over raw byte payloads (decodes both sides). */
  def snrDbBytes(ref: Array[Byte], cand: Array[Byte]): Double = {
    if (ref == null || cand == null) Double.NegativeInfinity
    else snrDb(decode(ref), decode(cand))
  }

  /** SNR straight off the byte payloads — decode fused into the accumulation
    * loop, no intermediate short[] allocations (two fewer allocations + two
    * fewer passes per row on the engine's hottest path). Bit-identical to
    * [[snrDbBytes]]: the same int16 sample values (little-endian, odd tail
    * byte truncated) accumulated in the same order. Called from
    * whole-stage-generated Java ([[graft.functions.PcmSnr]]), so it must
    * stay a static-forwardable object method with no overloads.
    */
  def snrDbBytesDirect(ref: Array[Byte], cand: Array[Byte]): Double = {
    if (ref == null || cand == null) return Double.NegativeInfinity
    val n = ref.length / 2
    if (n != cand.length / 2 || n == 0) return Double.NegativeInfinity
    var sig = 0.0
    var noise = 0.0
    var i = 0
    while (i < n) {
      val r = (((ref(2 * i) & 0xFF) | (ref(2 * i + 1) << 8)).toShort).toDouble
      val c = (((cand(2 * i) & 0xFF) | (cand(2 * i + 1) << 8)).toShort).toDouble
      val d = r - c
      sig += r * r
      noise += d * d
      i += 1
    }
    if (noise == 0.0) Double.PositiveInfinity
    else if (sig == 0.0) Double.NegativeInfinity
    else 10.0 * math.log10(sig / noise)
  }

  /** The row invariant: decoded-PCM allclose at >= 30 dB SNR. */
  def pcmAllClose(ref: Array[Byte], cand: Array[Byte], minSnrDb: Double = 30.0): Boolean =
    snrDbBytes(ref, cand) >= minSnrDb
}
