package graft

import org.apache.hadoop.fs.{FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Object-store-semantics twin of [[GraftTestFs]]: every `create`
  * buffers to a hidden staged sibling and publishes the WHOLE object
  * with one atomic rename on close — the visibility model real store
  * connectors (s3a, gcs, abfs) give a PUT. A reader polling a path
  * being overwritten therefore sees the old object's full bytes until
  * the new object commits, never a truncated or missing file. Like
  * GraftTestFs it registers under a non-`file://` scheme so java.nio
  * fallbacks fail immediately. */
class GraftStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftstore"
  override def getUri: java.net.URI = java.net.URI.create("graftstore:///")

  // RawLocalFileSystem overrides this variant WITHOUT routing through
  // the permissioned one — without this forward, FileSystem.create(p,
  // overwrite) bypasses the staging and truncates in place
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    create(f, FsPermission.getFileDefault, overwrite, bufferSize,
      replication, blockSize, progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && exists(f))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    val staged = new Path(f.getParent,
      s".${f.getName}.__put${System.nanoTime()}")
    val out = super.create(staged, permission, true, bufferSize,
      replication, blockSize, progress)
    val src = pathToFile(staged).toPath
    val dst = pathToFile(f).toPath
    new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = {
        super.close()
        java.nio.file.Files.move(src, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }, null)
  }
}

/** [[GraftStoreFs]] with an injected read fault: opening any path whose
  * name contains "boom" yields a stream that fails on the first read —
  * the mid-copy failure LakeFs.promote's single-PUT fallback must
  * survive WITHOUT committing a truncated object. */
class GraftBoomFs extends GraftStoreFs {
  override def getScheme: String = "graftboom"
  override def getUri: java.net.URI = java.net.URI.create("graftboom:///")

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    val real = super.open(f, bufferSize)
    if (!f.getName.contains("boom")) real
    else new org.apache.hadoop.fs.FSDataInputStream(
      new org.apache.hadoop.fs.FSInputStream {
        override def read(): Int =
          throw new java.io.IOException("boom: injected read failure")
        override def read(b: Array[Byte], off: Int, len: Int): Int = read()
        override def seek(pos: Long): Unit = real.seek(pos)
        override def getPos: Long = real.getPos
        override def seekToNewSource(targetPos: Long): Boolean = false
        override def close(): Unit = real.close()
      })
  }
}
