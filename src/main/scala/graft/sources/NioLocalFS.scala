package graft.sources

import java.io.FileNotFoundException
import java.net.URI
import java.nio.file.{Files, LinkOption, NoSuchFileException}
import java.nio.file.attribute.{PosixFileAttributeView, PosixFilePermission}
import java.util.{Set => JSet}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free local filesystem.
  *
  * Without the native Hadoop library (`libhadoop.so` — absent from this
  * deployment and from most Spark container images), Hadoop's
  * `RawLocalFileSystem.setPermission` shells out a `chmod` CHILD
  * PROCESS (`Shell.execCommand`) — and setPermission runs on EVERY
  * stream create (`LocalFSFileOutputStream` applies the create mode
  * that way) and every `mkdirs`. Measured in this sandbox: a stock
  * create+close of a tiny file costs 7.6 ms and ~11 forks (data file +
  * .crc + parent probes); with this override 0.74 ms and none. A
  * lifecycle-heavy query (table create + DML commits + log replay)
  * forked ~2,300 processes per run — over half its wall time, all
  * charged to driver-side gaps between Spark jobs.
  *
  * The override replaces the fork with a single `java.nio` syscall
  * (`setPosixFilePermissions` ≙ fchmodat) with identical observable
  * semantics. The shapes java.nio cannot express (setuid/setgid/
  * sticky bits, non-POSIX stores) fall back to the stock shell path.
  * `getFileStatus` is deliberately NOT overridden: the stock
  * deprecated-status path is plain `java.io` and does not fork (the
  * lazy `ls -ld` fallback only triggers when a caller reads
  * permissions off a listed status, which Spark's scan/commit paths
  * never do — and a nio replacement measured 2× slower per call).
  *
  * Wired via `spark.hadoop.fs.file.impl` (FileSystem API) and
  * `spark.hadoop.fs.AbstractFileSystem.file.impl` (FileContext API —
  * streaming checkpoint managers); both default to the stock classes
  * if unset, so this is a pure opt-in. Cluster deployments with
  * `libhadoop.so` present don't need it (NativeIO wins), but it is
  * never wrong: the syscall is the same one the native lib makes.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  import NioLocalFS._

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    if ((bits & ~0x1ff) != 0) { // setuid/setgid/sticky: nio can't, shell can
      super.setPermission(p, permission)
      return
    }
    val f = pathToFile(p)
    try {
      val view = Files.getFileAttributeView(f.toPath,
        classOf[PosixFileAttributeView], LinkOption.NOFOLLOW_LINKS)
      if (view == null) super.setPermission(p, permission)
      else view.setPermissions(toNioPerms(bits))
    } catch {
      case _: NoSuchFileException =>
        throw new FileNotFoundException(s"File $p does not exist")
      case _: UnsupportedOperationException => super.setPermission(p, permission)
    }
  }
}

/** `LocalFileSystem` (checksummed, the default `file://` scheme
  * implementation) over the fork-free raw layer. */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** FileContext (AbstractFileSystem) twins — streaming checkpoint
  * managers (`FileContextBasedCheckpointFileManager`) route through
  * these, not the FileSystem API. Mirrors the stock
  * `local.RawLocalFs` / `local.LocalFs` pair. */
class NioRawLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NioRawLocalFileSystem, conf, "file", false)

class NioLocalFs(uri: URI, conf: Configuration)
  extends ChecksumFs(new NioRawLocalFs(uri, conf))

object NioLocalFS {
  private val permBits: Array[PosixFilePermission] = Array(
    // bit 8 (0400) .. bit 0 (0001) in FsPermission order
    PosixFilePermission.OWNER_READ, PosixFilePermission.OWNER_WRITE,
    PosixFilePermission.OWNER_EXECUTE,
    PosixFilePermission.GROUP_READ, PosixFilePermission.GROUP_WRITE,
    PosixFilePermission.GROUP_EXECUTE,
    PosixFilePermission.OTHERS_READ, PosixFilePermission.OTHERS_WRITE,
    PosixFilePermission.OTHERS_EXECUTE)

  private[graft] def toNioPerms(bits: Int): JSet[PosixFilePermission] = {
    val s = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    var i = 0
    while (i < 9) {
      if ((bits & (1 << (8 - i))) != 0) s.add(permBits(i))
      i += 1
    }
    s
  }

  private[graft] def fromNioPerms(perms: JSet[PosixFilePermission]): FsPermission = {
    var bits = 0
    var i = 0
    while (i < 9) {
      if (perms.contains(permBits(i))) bits |= 1 << (8 - i)
      i += 1
    }
    new FsPermission(bits.toShort)
  }
}
