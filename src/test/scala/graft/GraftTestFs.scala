package graft

/** A test-only Hadoop FileSystem with a NON-`file://` scheme, backed by
  * the local disk: registering `fs.graftfs.impl` makes `graftfs:/...`
  * paths resolve through the exact `FileSystem`-API code paths an
  * `s3a://`/`hdfs://` lake would take (scheme-based FS lookup, Hadoop
  * listing/rename/delete), while still being runnable in a sandbox with
  * no object store. Any lake operation that secretly falls back to
  * `java.nio` breaks immediately on these paths — java.nio cannot
  * resolve the scheme. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
