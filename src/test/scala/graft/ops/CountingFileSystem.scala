package graft.ops

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Test-only observable FileSystem: a `cfs:` scheme that delegates to the
  * local filesystem while recording every `listStatus`/`exists` path.
  *
  * StoredIndex exists to BOUND driver metadata calls (its scaladoc:
  * O(probed) point checks on narrow probes, exactly one listing on wide
  * probes, zero store calls on the empty probe) — but result-correctness
  * specs can't see a regression that re-introduces store-wide discovery:
  * the r15-r18 full-store-listing bug returned correct rows for four
  * rounds and only surfaced as cross-round bench drift. These counters
  * make the metadata-call contract a unit-test assertion. */
object CountingFs {
  private val listed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val existed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = { listed.clear(); existed.clear() }
  def listedPaths: Seq[String] = {
    import scala.jdk.CollectionConverters._
    listed.asScala.toSeq
  }
  def existedPaths: Seq[String] = {
    import scala.jdk.CollectionConverters._
    existed.asScala.toSeq
  }
  private[ops] def recordList(p: Path): Unit = listed.add(p.toUri.getPath)
  private[ops] def recordExists(p: Path): Unit = existed.add(p.toUri.getPath)
}

class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "cfs"
  override def getUri: URI = URI.create("cfs:///")
  override def listStatus(f: Path): Array[FileStatus] = {
    CountingFs.recordList(f)
    super.listStatus(f)
  }
  override def exists(f: Path): Boolean = {
    CountingFs.recordExists(f)
    super.exists(f)
  }
}
