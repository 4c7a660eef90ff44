package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** A filesystem that SIMULATES S3 WITHOUT CONDITIONAL PUT: every
  * `create(path, overwrite = false)` silently wins, even when the file
  * exists — the exact property that breaks exclusive-create-based
  * commit tokens. Local bytes under the `nocas://` scheme otherwise.
  */
class NoCasFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "nocas"
  override def getUri: java.net.URI = java.net.URI.create("nocas:///")
  // ignore overwrite=false on EVERY create overload — a PUT always
  // wins, like S3 without If-None-Match
  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)
  override def createNonRecursive(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.createNonRecursive(f, permission, true, bufferSize, replication,
      blockSize, progress)
}

/** ENFORCED OBJECT-STORE CONTRACT (StoreFS.verifyConditionalCreate):
  * on a filesystem whose exclusive create is not exclusive, the store
  * must fail LOUDLY at token acquisition — never hand two writers the
  * same commit token and corrupt the log. A compliant scheme'd
  * filesystem (file://) passes the same probe (StoreFSSpec's lifecycle
  * already runs a full store through it).
  */
class ObjectStoreContractSpec extends AnyFunSuite {

  test("a no-conditional-put filesystem is refused loudly at the commit token") {
    sys.props("graft.hadoop.fs.nocas.impl") = classOf[NoCasFileSystem].getName
    sys.props("graft.hadoop.fs.nocas.impl.disable.cache") = "true"
    try {
      val local = java.nio.file.Files.createTempDirectory("graft_nocas").toString
      val dir = "nocas://" + local
      val e = intercept[IllegalStateException] {
        ManifestSource.withCommitToken(dir) { fail("must not reach the commit") }
      }
      assert(e.getMessage.contains("exclusive create") &&
        e.getMessage.contains("lock service"),
        s"refusal must name the failure and the remedy, got: ${e.getMessage}")
    } finally {
      sys.props.remove("graft.hadoop.fs.nocas.impl")
      sys.props.remove("graft.hadoop.fs.nocas.impl.disable.cache")
      ()
    }
  }

  test("a compliant scheme'd filesystem passes the probe and takes the token") {
    val local = java.nio.file.Files.createTempDirectory("graft_cas_ok").toString
    val dir = "file://" + local
    var ran = false
    ManifestSource.withCommitToken(dir) { ran = true }
    assert(ran, "compliant FS must acquire the token normally")
    assert(!StoreFS.exists(dir, "commit.lock"), "token must be released")
  }

  // ---- rename half of the contract (round-15 verdict #7) ----------------
  //
  // No behavioral probe can distinguish a POSIX atomic-replace rename
  // from an S3 copy+delete rename from one process, so the rename gate
  // is DECLARATIVE: known copy-rename schemes (s3a & co) are refused at
  // the pointer flip absent an explicit opt-in. Simulated by registering
  // a perfectly functional local filesystem UNDER the s3a scheme — the
  // refusal must fire on the scheme's known semantics, not on observed
  // behavior.

  test("a known copy-rename scheme is refused loudly at the pointer flip") {
    sys.props("graft.hadoop.fs.s3a.impl") = classOf[S3LikeFileSystem].getName
    sys.props("graft.hadoop.fs.s3a.impl.disable.cache") = "true"
    try {
      val local = java.nio.file.Files.createTempDirectory("graft_noren").toString
      val dir = "s3a://" + local
      StoreFS.writeString(dir, "VERSION.tmp", "manifest.csv\n")
      val e = intercept[IllegalStateException] {
        StoreFS.atomicMove(dir, "VERSION.tmp", "VERSION")
      }
      assert(e.getMessage.contains("atomic rename") &&
        e.getMessage.contains("graft.store.assumeAtomicRename"),
        s"refusal must name the failure and the opt-in, got: ${e.getMessage}")
      assert(!StoreFS.exists(dir, "VERSION"),
        "no pointer may appear on a refused flip")
    } finally {
      sys.props.remove("graft.hadoop.fs.s3a.impl")
      sys.props.remove("graft.hadoop.fs.s3a.impl.disable.cache")
      ()
    }
  }

  test("the explicit opt-in admits a fronted copy-rename scheme") {
    sys.props("graft.hadoop.fs.s3a.impl") = classOf[S3LikeFileSystem].getName
    sys.props("graft.hadoop.fs.s3a.impl.disable.cache") = "true"
    sys.props("graft.store.assumeAtomicRename") = "s3a"
    try {
      val local = java.nio.file.Files.createTempDirectory("graft_renok").toString
      val dir = "s3a://" + local
      StoreFS.writeString(dir, "VERSION.tmp", "manifest.csv\n")
      StoreFS.atomicMove(dir, "VERSION.tmp", "VERSION")
      assert(StoreFS.readLines(dir, "VERSION").head.trim == "manifest.csv")
    } finally {
      sys.props.remove("graft.hadoop.fs.s3a.impl")
      sys.props.remove("graft.hadoop.fs.s3a.impl.disable.cache")
      sys.props.remove("graft.store.assumeAtomicRename")
      ()
    }
  }
}

/** A functional local filesystem registered under the `s3a` scheme:
  * behaviorally fine, but its SCHEME declares copy+delete rename
  * semantics — exactly what the declarative rename gate must refuse.
  */
class S3LikeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
}
