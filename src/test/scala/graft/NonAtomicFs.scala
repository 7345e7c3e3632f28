package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FSDataOutputStream, FileStatus, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Deterministic interleaving hooks for [[NonAtomicFileSystem]] — latches
  * go here so CasProtocolSpec can freeze one writer mid-operation while a
  * second "process" runs its whole claim.
  */
object NonAtomicFsHooks {
  @volatile var beforeRenameCopy: Path => Unit = _ => ()
  @volatile var beforeExclusiveCreate: Path => Unit = _ => ()
  def reset(): Unit = {
    beforeRenameCopy = _ => ()
    beforeExclusiveCreate = _ => ()
  }
}

/** A deliberately NON-ATOMIC filesystem modeling an object store on local
  * disk, scheme `nonatomic://`:
  *
  *  - `rename` is the object-store emulation: a per-object LIST+COPY+
  *    DELETE that MERGES into an existing destination and never takes a
  *    lock — no exclusivity, no atomicity, success even when the slot is
  *    already occupied. (S3A's rename is exactly this shape.)
  *  - `create(path, overwrite = false)` IS an atomic conditional put
  *    (`Files.createFile` — CREATE_NEW at the OS level), modeling S3
  *    `If-None-Match: *` / GCS preconditions — the one exclusivity
  *    primitive object stores do offer.
  *
  * CasProtocolSpec runs both committers against this filesystem: the
  * rename committer double-publishes (the hazard the conditional-put
  * committer exists to close), the conditional-put committer admits
  * exactly one writer.
  */
class NonAtomicFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")

  // RawLocalFileSystem's status objects load permissions LAZILY via
  // `new File(path.toUri)`, which rejects any scheme but file:// — return
  // eagerly-populated statuses so listFiles works under nonatomic://
  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, FsPermission.getDefault, "u", "g", s.getPath)

  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(eager)

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    NonAtomicFsHooks.beforeRenameCopy(src)
    val srcPrefix = src.toUri.getPath + "/"
    val it = listFiles(src, true)
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toUri.getPath.stripPrefix(srcPrefix)
      FileUtil.copy(this, s.getPath, this, new Path(dst, rel), false, getConf)
    }
    delete(src, true)
    true
  }

  private def exclusivePut(f: Path): Unit = {
    NonAtomicFsHooks.beforeExclusiveCreate(f)
    mkdirs(f.getParent)
    try java.nio.file.Files.createFile(pathToFile(f).toPath)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          s"conditional put failed: $f already exists")
    }
  }

  override def create(
      f: Path, overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      exclusivePut(f)
      super.create(f, true, bufferSize, replication, blockSize, progress)
    } else super.create(f, overwrite, bufferSize, replication, blockSize, progress)

  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      exclusivePut(f)
      super.create(f, permission, true, bufferSize, replication, blockSize, progress)
    } else super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
}

/** FileContext binding for the shim. Overrides the 3-arg renameInternal
  * to SKIP AbstractFileSystem's generic client-side no-overwrite guard —
  * a real object-store connector has no atomic guard to offer, and the
  * guard's check-then-act would only hide the race the spec needs to
  * demonstrate.
  */
class NonAtomicAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NonAtomicFileSystem, conf, "nonatomic", false) {
  override def renameInternal(src: Path, dst: Path, overwrite: Boolean): Unit = {
    fsImpl.rename(src, dst)
    ()
  }
}
