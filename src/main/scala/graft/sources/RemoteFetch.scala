package graft.sources

import java.io.{BufferedInputStream, FileOutputStream, InputStream}
import java.net.URI

/** Remote single-object fetch (S7): download a payload by URL to a local
  * file, or straight into memory as decoded BGR pixels.
  *
  * Replicates `jigsaw/io_utils.py:15` (`download_image_and_save`) and
  * `io_utils.py:28` (`load_remote_image`). Driver-side utility by design —
  * the reference uses it for one-off asset pulls, not dataset scans; bulk
  * ingestion goes through [[CorpusBinder]]'s Hadoop-FS scans, which already
  * speak any mounted scheme at cluster scale. Any scheme `java.net.URL`
  * handles works (http/https/file).
  */
object RemoteFetch {

  /** JDK URLConnection defaults to INFINITE timeouts — a black-holed
    * server would wedge the driver. Bounded but generous (assets, not
    * RPCs).
    */
  private val ConnectTimeoutMs = 30000
  private val ReadTimeoutMs = 120000

  private def withStream[A](url: String)(f: InputStream => A): A = {
    val conn = URI.create(url).toURL.openConnection()
    conn.setConnectTimeout(ConnectTimeoutMs)
    conn.setReadTimeout(ReadTimeoutMs)
    val in = new BufferedInputStream(conn.getInputStream)
    try f(in) finally in.close()
  }

  /** Download `url` to local `destination`; returns bytes written.
    * (`io_utils.py:15` — streamed copy, no full-payload buffering.)
    * A failed TRANSFER deletes the partial destination before rethrowing,
    * so an interrupted fetch can never be mistaken for a complete payload
    * by a later run. Failures BEFORE the destination is opened (connect
    * timeout, DNS, bad URL) leave any pre-existing destination file
    * untouched — deleting there would destroy a previous run's good copy.
    */
  def fetchToFile(url: String, destination: String): Long =
    withStream(url) { in =>
      // reaching here means the connection succeeded; only now may the
      // destination be created/truncated, so only from here may a failure
      // delete it
      try {
        val out = new FileOutputStream(destination)
        try in.transferTo(out) finally out.close()
      } catch {
        case e: Throwable =>
          new java.io.File(destination).delete()
          throw e
      }
    }

  /** Fetch `url` fully into memory. */
  def fetchBytes(url: String): Array[Byte] =
    withStream(url)(_.readAllBytes())

  /** Fetch and decode an image to (width, height, BGR pixels) — the same
    * H×W×3 layout every [[graft.operators.PixelOps]] kernel consumes
    * (`io_utils.py:28` returns the cv2 BGR array). None when the payload
    * is not a decodable image.
    */
  def loadRemoteImage(url: String): Option[(Int, Int, Array[Byte])] =
    ImageCodec.decodeBgr(fetchBytes(url))
}
