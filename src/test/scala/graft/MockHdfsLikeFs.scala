package graft

import java.net.URI

import org.apache.hadoop.fs.Path

/** A local-disk Hadoop FileSystem registered under a NON-file scheme
  * with HDFS rename semantics (rename to an existing destination fails
  * instead of overwriting). Lets the suite exercise every remote-scheme
  * code path — scheme-in-path routing through `Path.getFileSystem`, and
  * SnapshotTable's rename-based manifest publication — without a real
  * HDFS in the sandbox. */
class MockHdfsLikeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")
  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
}
