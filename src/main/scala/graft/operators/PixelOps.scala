package graft.operators

/** Pixel-grid operators over decoded H×W×3 (BGR, row-major) byte tensors —
  * the real math behind the reference's mask transforms, independent of any
  * imaging library (PNG decode itself is stubbed in-container; these run on
  * whatever decoded grid is supplied and are exact).
  *
  * Reference semantics:
  *  - T2 repaint: recolor all pixels of merged labels
  *    (`jigsaw/model_utils/base/mask.py:200-206`)
  *  - T8 mask → instance boxes: per-color binary mask → external contours →
  *    per-contour bounding rect (`jigsaw/models/bbox/model.py:381-390`);
  *    external contours of a binary mask ≡ connected components here
  *  - T9 color-tolerance match ±2/channel
  *    (`jigsaw/models/instance_mask/model.py:83-113`; the reference's
  *    `[-2 -1, 0, 1, 2]` literal bug is NOT replicated — we implement the
  *    intended ±2)
  *  - T10 mask → grayscale class-id image (`jigsaw/models/deeplab/model.py:
  *    17-44`)
  *  - A5 extent: bounding box of nonzero pixels
  *    (`jigsaw/models/instance_mask/model.py:104-107`)
  */
object PixelOps {

  final case class Box(xmin: Int, ymin: Int, xmax: Int, ymax: Int)

  @inline private def idx(x: Int, y: Int, w: Int): Int = (y * w + x) * 3

  /** T9: binary mask of pixels within ±tol per channel of `bgr`. */
  def matchColor(pixels: Array[Byte], w: Int, h: Int,
      bgr: (Int, Int, Int), tol: Int = 2): Array[Boolean] = {
    val out = new Array[Boolean](w * h)
    var p = 0
    while (p < w * h) {
      val i = p * 3
      out(p) =
        math.abs((pixels(i) & 0xff) - bgr._1) <= tol &&
        math.abs((pixels(i + 1) & 0xff) - bgr._2) <= tol &&
        math.abs((pixels(i + 2) & 0xff) - bgr._3) <= tol
      p += 1
    }
    out
  }

  /** 4-connected component labeling (iterative flood fill). Returns the
    * label grid (0 = background, 1..count = components) and the count.
    */
  def connectedComponents(mask: Array[Boolean], w: Int,
      h: Int): (Array[Int], Int) = {
    val labels = new Array[Int](w * h)
    var next = 0
    val stack = new java.util.ArrayDeque[Int]()
    var p = 0
    while (p < w * h) {
      if (mask(p) && labels(p) == 0) {
        next += 1
        labels(p) = next
        stack.push(p)
        while (!stack.isEmpty) {
          val q = stack.pop()
          val x = q % w; val y = q / w
          var d = 0
          while (d < 4) {
            val nx = x + (d match { case 0 => 1; case 1 => -1; case _ => 0 })
            val ny = y + (d match { case 2 => 1; case 3 => -1; case _ => 0 })
            if (nx >= 0 && nx < w && ny >= 0 && ny < h) {
              val nq = ny * w + nx
              if (mask(nq) && labels(nq) == 0) {
                labels(nq) = next
                stack.push(nq)
              }
            }
            d += 1
          }
        }
      }
      p += 1
    }
    (labels, next)
  }

  /** Per-component bounding rectangles, component order (1..count). */
  def boundingRects(labels: Array[Int], w: Int, h: Int,
      count: Int): Seq[Box] = {
    if (count == 0) return Seq.empty
    val xmin = Array.fill(count)(Int.MaxValue)
    val ymin = Array.fill(count)(Int.MaxValue)
    val xmax = Array.fill(count)(-1)
    val ymax = Array.fill(count)(-1)
    var p = 0
    while (p < labels.length) {
      val l = labels(p)
      if (l > 0) {
        val x = p % w; val y = p / w
        val i = l - 1
        if (x < xmin(i)) xmin(i) = x
        if (x > xmax(i)) xmax(i) = x
        if (y < ymin(i)) ymin(i) = y
        if (y > ymax(i)) ymax(i) = y
      }
      p += 1
    }
    (0 until count).map(i => Box(xmin(i), ymin(i), xmax(i), ymax(i)))
  }

  /** T8: instance boxes for one label color = tolerance match → connected
    * components → per-component rects. 0..N boxes per image (UDTF shape:
    * expose via a UDF returning ARRAY<STRUCT> + explode).
    */
  def instanceBoxes(pixels: Array[Byte], w: Int, h: Int,
      bgr: (Int, Int, Int), tol: Int = 2): Seq[Box] = {
    val mask = matchColor(pixels, w, h, bgr, tol)
    val (labels, count) = connectedComponents(mask, w, h)
    boundingRects(labels, w, h, count)
  }

  /** A5: extent (bounding box of all set pixels), None if mask empty. */
  def extent(mask: Array[Boolean], w: Int, h: Int): Option[Box] = {
    var x0 = Int.MaxValue; var y0 = Int.MaxValue; var x1 = -1; var y1 = -1
    var p = 0
    while (p < mask.length) {
      if (mask(p)) {
        val x = p % w; val y = p / w
        if (x < x0) x0 = x; if (x > x1) x1 = x
        if (y < y0) y0 = y; if (y > y1) y1 = y
      }
      p += 1
    }
    if (x1 < 0) None else Some(Box(x0, y0, x1, y1))
  }

  /** T2: repaint every pixel matching any `from` color (exact) to `to`.
    * Returns a new buffer; input untouched (pure transformation).
    */
  def repaint(pixels: Array[Byte], from: Seq[(Int, Int, Int)],
      to: (Int, Int, Int)): Array[Byte] = {
    val out = pixels.clone()
    val n = pixels.length / 3
    var p = 0
    while (p < n) {
      val i = p * 3
      val b = pixels(i) & 0xff
      val g = pixels(i + 1) & 0xff
      val r = pixels(i + 2) & 0xff
      if (from.exists(c => c._1 == b && c._2 == g && c._3 == r)) {
        out(i) = to._1.toByte
        out(i + 1) = to._2.toByte
        out(i + 2) = to._3.toByte
      }
      p += 1
    }
    out
  }

  /** Deterministic fresh color for a merge target: seeded by a stable key
    * (e.g. image_id) instead of the reference's global RNG
    * (`mask.py:189-198`), retried until it collides with no existing color.
    */
  def freshColor(seedKey: String,
      existing: Set[(Int, Int, Int)]): (Int, Int, Int) = {
    val rnd = new scala.util.Random(seedKey.hashCode.toLong)
    Iterator.continually(
      (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      .dropWhile(existing.contains).next()
  }

  /** T10: BGR mask → uint8 class-id grid via a color→class dictionary;
    * unknown colors → 0 (background).
    */
  def classIdImage(pixels: Array[Byte], w: Int, h: Int,
      colorToClass: Map[(Int, Int, Int), Int]): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var p = 0
    while (p < w * h) {
      val i = p * 3
      val c = (pixels(i) & 0xff, pixels(i + 1) & 0xff, pixels(i + 2) & 0xff)
      out(p) = colorToClass.getOrElse(c, 0).toByte
      p += 1
    }
    out
  }
}
