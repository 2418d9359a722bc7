package graft

import java.awt.image.BufferedImage
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RemoteFetch

/** S7 remote fetch: exercised over file:// URLs (same java.net.URL code
  * path as http, no network needed in the sandbox).
  */
class RemoteFetchSpec extends AnyFunSuite {

  private def tempPng(): java.nio.file.Path = {
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // red top-left
    img.setRGB(2, 1, 0x0000ff) // blue bottom-right
    val p = Files.createTempFile("remote_fetch", ".png")
    javax.imageio.ImageIO.write(img, "png", p.toFile)
    p
  }

  test("fetchToFile streams the payload byte-exactly") {
    val src = tempPng()
    val dst = Files.createTempFile("fetched", ".png")
    val n = RemoteFetch.fetchToFile(src.toUri.toString, dst.toString)
    assert(n == Files.size(src))
    assert(Files.readAllBytes(dst).sameElements(Files.readAllBytes(src)))
  }

  test("loadRemoteImage decodes to the BGR layout PixelOps consumes") {
    val src = tempPng()
    val Some((w, h, bgr)) = RemoteFetch.loadRemoteImage(src.toUri.toString)
    assert(w == 3 && h == 2 && bgr.length == 3 * 2 * 3)
    // BGR byte order: red pixel → (0, 0, 255)
    assert((bgr(0) & 0xff, bgr(1) & 0xff, bgr(2) & 0xff) == ((0, 0, 255)))
    val off = (1 * 3 + 2) * 3 // bottom-right
    assert((bgr(off) & 0xff, bgr(off + 2) & 0xff) == ((255, 0)))
  }

  test("undecodable remote payloads yield None, not an exception") {
    val junk = Files.createTempFile("junk", ".bin")
    Files.write(junk, Array[Byte](1, 2, 3, 4))
    assert(RemoteFetch.loadRemoteImage(junk.toUri.toString).isEmpty)
  }
}
