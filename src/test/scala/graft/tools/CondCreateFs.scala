package graft.tools

import java.net.URI
import org.apache.hadoop.fs.{FSDataOutputStream, FSDataOutputStreamBuilder, Path, RawLocalFileSystem}

/** Simulated conditional-create object store for the cross-process
  * lock race (verdict r15 item 5): a local filesystem under the
  * `condfs:` scheme that (a) ADVERTISES
  * `fs.option.create.conditional.overwrite` through the capability
  * probe — so [[graft.operators.Lakehouse]] admits it via the
  * capability branch, not the scheme allowlist — and (b) HONORS the
  * option in its createFile builder: the create-if-absent arbiter is
  * `File.createNewFile` (atomic on a local FS, standing in for the
  * store's conditional PUT), and a lost race surfaces as the S3-shaped
  * `PreconditionFailed … 412 … If-None-Match` IOException that
  * `isLockContention` classifies. Registered per-process via
  * `fs.condfs.impl`.
  */
class CondCreateFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("condfs:///")

  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability == graft.operators.Lakehouse.ConditionalCreateCapability ||
      super.hasPathCapability(path, capability)

  /** protected pathToFile, re-exposed for the companion builder. */
  private[tools] def toLocalFile(p: Path): java.io.File = pathToFile(p)

  override def createFile(path: Path)
      : FSDataOutputStreamBuilder[_ <: FSDataOutputStream, _] =
    new CondCreateFs.Builder(this, path)
}

object CondCreateFs {
  class Builder(fs: CondCreateFs, p: Path)
      extends FSDataOutputStreamBuilder[FSDataOutputStream, Builder](fs, p) {
    override def getThisBuilder: Builder = this
    override def build(): FSDataOutputStream = {
      // the conditional PUT: File.createNewFile is the atomic
      // cross-process arbiter; losing it raises the conditional-write
      // error shape a real store returns at PUT/close time
      val f = fs.toLocalFile(getPath)
      Option(f.getParentFile).foreach(_.mkdirs())
      if (!f.createNewFile())
        throw new java.io.IOException(
          s"PreconditionFailed: conditional create (If-None-Match) lost " +
            s"the race for $getPath (Status Code: 412)")
      // we own the marker now; hand back a plain stream over it
      fs.create(getPath, true)
    }
  }
}
