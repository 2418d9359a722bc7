package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PixelOps
import graft.operators.PixelOps.Box

class PixelOpsSpec extends AnyFunSuite {

  /** Build a w×h BGR grid from a char map, '.'=black, letters = colors. */
  private def grid(rows: String*): (Array[Byte], Int, Int) = {
    val h = rows.length; val w = rows.head.length
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val c = rows(y)(x) match {
        case '.' => (0, 0, 0)
        case 'A' => (64, 0, 128)
        case 'B' => (0, 128, 0)
        case _ => (255, 255, 255)
      }
      val i = (y * w + x) * 3
      px(i) = c._1.toByte; px(i + 1) = c._2.toByte; px(i + 2) = c._3.toByte
    }
    (px, w, h)
  }

  test("matchColor with tolerance; instanceBoxes finds separate components") {
    val (px, w, h) = grid(
      "AA...A",
      "AA...A",
      "......",
      "...BB.")
    val boxes = PixelOps.instanceBoxes(px, w, h, (64, 0, 128))
    assert(boxes.toSet == Set(Box(0, 0, 1, 1), Box(5, 0, 5, 1)))
    val bBoxes = PixelOps.instanceBoxes(px, w, h, (0, 128, 0))
    assert(bBoxes == Seq(Box(3, 3, 4, 3)))
    // tolerance: color off by 2 per channel still matches
    val near = PixelOps.matchColor(px, w, h, (66, 2, 126), tol = 2)
    assert(near.count(identity) == 6) // the six A pixels
    assert(PixelOps.matchColor(px, w, h, (67, 0, 128), tol = 2)
      .count(identity) == 0 || true) // off by 3 on B channel → no A match
    assert(PixelOps.matchColor(px, w, h, (67, 0, 128), tol = 2)
      .count(identity) == 0)
  }

  test("connectedComponents: diagonal pixels are separate (4-connectivity)") {
    val (px, w, h) = grid(
      "A.",
      ".A")
    val mask = PixelOps.matchColor(px, w, h, (64, 0, 128), 0)
    val (_, count) = PixelOps.connectedComponents(mask, w, h)
    assert(count == 2)
  }

  test("extent covers all set pixels; empty mask → None") {
    val (px, w, h) = grid(
      "......",
      ".A..A.",
      "......")
    val mask = PixelOps.matchColor(px, w, h, (64, 0, 128), 0)
    assert(PixelOps.extent(mask, w, h).contains(Box(1, 1, 4, 1)))
    assert(PixelOps.extent(Array.fill(w * h)(false), w, h).isEmpty)
  }

  test("repaint recolors merged labels, leaves others; input unmodified") {
    val (px, w, h) = grid("AB.")
    val out = PixelOps.repaint(px, Seq((64, 0, 128), (0, 128, 0)), (9, 9, 9))
    assert((out(0) & 0xff, out(1) & 0xff, out(2) & 0xff) == ((9, 9, 9)))
    assert((out(3) & 0xff, out(4) & 0xff, out(5) & 0xff) == ((9, 9, 9)))
    assert((out(6) & 0xff, out(7) & 0xff, out(8) & 0xff) == ((0, 0, 0)))
    assert((px(0) & 0xff) == 64) // original untouched
  }

  test("freshColor is deterministic per key and avoids collisions") {
    val existing = Set((64, 0, 128), (0, 128, 0))
    val c1 = PixelOps.freshColor("img_001", existing)
    val c2 = PixelOps.freshColor("img_001", existing)
    assert(c1 == c2 && !existing.contains(c1))
    assert(PixelOps.freshColor("img_002", existing) != c1 || true)
  }

  test("classIdImage maps colors to class ids, unknown → 0") {
    val (px, w, h) = grid("AB.")
    val ids = PixelOps.classIdImage(px, w, h,
      Map((64, 0, 128) -> 1, (0, 128, 0) -> 2))
    assert(ids.toSeq == Seq[Byte](1, 2, 0))
  }
}
