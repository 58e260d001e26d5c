package graft.functions

/**
 * Discrete wavelet transforms: full pyramid over a power-of-two
 * series, periodic (circular) boundary — the filter-bank semantics the
 * reference reaches through GSL (`oph_explorenc` wavelet modes and the
 * oph_gsl_* primitive namespace; the reference server knows them only
 * by objkey, `/root/reference/src/oph_json/oph_json_objkeys.h:121`).
 * Public-domain math re-derived from the standard orthonormal filter
 * banks; no GSL code.
 *
 * Families: `haar` (2-tap) and `db4` / `daubechies4` (4-tap
 * Daubechies). Both are orthonormal, so Parseval holds exactly:
 * sum(x^2) == sum(coeff^2) — the property the specs pin.
 *
 * Layout after `forward`: index 0 holds the final smooth coefficient;
 * detail coefficients of level L (0 = coarsest detail, the single
 * +/- split of the 2-element stage) occupy [2^L, 2^(L+1)).
 */
object Wavelet {

  private val Sqrt2 = math.sqrt(2.0)
  private val S3 = math.sqrt(3.0)

  /** Orthonormal low-pass (scaling) filter of a family; the high-pass
    * is derived by the quadrature-mirror rule g(k) = (-1)^k h(L-1-k). */
  def lowpass(family: String): Array[Double] = family.toLowerCase match {
    case "haar" => Array(1 / Sqrt2, 1 / Sqrt2)
    case "db4" | "daubechies4" | "daubechies" => Array(
      (1 + S3) / (4 * Sqrt2), (3 + S3) / (4 * Sqrt2),
      (3 - S3) / (4 * Sqrt2), (1 - S3) / (4 * Sqrt2))
    // 6- and 8-tap Daubechies scaling filters — Daubechies' published
    // orthonormal constants (3 resp. 4 vanishing moments); the
    // Parseval and moment-annihilation specs pin them against typos
    case "db6" | "daubechies6" => Array(
      0.3326705529500825, 0.8068915093110924, 0.4598775021184914,
      -0.1350110200102546, -0.0854412738820267, 0.0352262918857095)
    case "db8" | "daubechies8" => Array(
      0.2303778133088964, 0.7148465705529154, 0.6308807679298587,
      -0.0279837694168599, -0.1870348117190931, 0.0308413818355607,
      0.0328830116668852, -0.0105974017850690)
    case f => throw new IllegalArgumentException(s"wavelet family '$f'")
  }

  def families: Seq[String] = Seq("haar", "db4", "db6", "db8")

  private def highAt(h: Array[Double], k: Int): Double =
    if (k % 2 == 0) h(h.length - 1 - k) else -h(h.length - 1 - k)

  /** One analysis step over the first n slots of `buf`: circular
    * convolution with the filter pair, smooths into [0, n/2), details
    * into [n/2, n). */
  private def step(buf: Array[Double], n: Int, h: Array[Double]): Unit = {
    val half = n / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < half) {
      var s = 0.0; var d = 0.0
      var k = 0
      while (k < h.length) {
        val x = buf((2 * i + k) % n)
        s += h(k) * x
        d += highAt(h, k) * x
        k += 1
      }
      out(i) = s; out(half + i) = d
      i += 1
    }
    System.arraycopy(out, 0, buf, 0, n)
  }

  /** One synthesis step (transpose of `step` — exact inverse since the
    * bank is orthonormal). */
  private def invStep(buf: Array[Double], n: Int, h: Array[Double]): Unit = {
    val half = n / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < half) {
      var k = 0
      while (k < h.length) {
        out((2 * i + k) % n) += h(k) * buf(i) + highAt(h, k) * buf(half + i)
        k += 1
      }
      i += 1
    }
    System.arraycopy(out, 0, buf, 0, n)
  }

  private def checkPow2(n: Int): Unit =
    require(n > 0 && (n & (n - 1)) == 0,
      s"wavelet: length $n is not a power of two")

  /** Full forward pyramid (new array; input untouched). */
  def forward(data: Array[Double], family: String): Array[Double] = {
    checkPow2(data.length)
    val h = lowpass(family)
    val buf = data.clone()
    var n = buf.length
    while (n >= 2) { step(buf, n, h); n /= 2 }
    buf
  }

  /** Full inverse pyramid (new array; input untouched). */
  def inverse(coeffs: Array[Double], family: String): Array[Double] = {
    checkPow2(coeffs.length)
    val h = lowpass(family)
    val buf = coeffs.clone()
    var n = 2
    while (n <= buf.length) { invStep(buf, n, h); n *= 2 }
    buf
  }

  /** Static entry point for the codegen'd Dwt expression: validates,
    * transforms, returns a fresh array. */
  def forwardChecked(data: Array[Double], family: String): Array[Double] =
    forward(data, family)
}
