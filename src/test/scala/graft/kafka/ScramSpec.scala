package graft.kafka

import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite

/** SCRAM-SHA-256 pinned to the RFC 7677 §3 test vector — both the
  * client exchange and the server-side verification reproduce the
  * published transcript exactly (user "user", password "pencil"). */
class ScramSpec extends AnyFunSuite {

  private val cnonce = "rOprNGfwEbeRWgbNEkqO"
  private val serverFirstVector =
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
  private val clientFinalVector =
    "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
  private val serverFinalVector = "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="

  test("RFC 7677 client transcript: first message, proof, server-signature verification") {
    val ex = new Scram.ClientExchange("user", "pencil", cnonce)
    assert(ex.firstMessage == "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    assert(ex.finalMessage(serverFirstVector) == clientFinalVector)
    ex.verifyServerFinal(serverFinalVector) // must not throw
    // a forged server signature (server never knew the password) is rejected
    val ex2 = new Scram.ClientExchange("user", "pencil", cnonce)
    ex2.finalMessage(serverFirstVector)
    val forged = intercept[IllegalArgumentException](
      ex2.verifyServerFinal("v=AAAATRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="))
    assert(forged.getMessage.contains("server signature"))
  }

  test("RFC 7677 server side: reproduces the published server-first and server-final") {
    val salt = Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val snonce = "%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
    val srv = new Scram.ServerExchange("user", "pencil", snonce, salt, 4096)
    assert(srv.serverFirst("n,,n=user,r=" + cnonce) == serverFirstVector)
    assert(srv.serverFinal(clientFinalVector) == serverFinalVector)
  }

  test("server rejects a proof computed from the wrong password") {
    val salt = Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val snonce = "%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
    val srv = new Scram.ServerExchange("user", "pencil", snonce, salt, 4096)
    val bad = new Scram.ClientExchange("user", "eraser", cnonce)
    val sf = srv.serverFirst(bad.firstMessage)
    val e = intercept[IllegalArgumentException](srv.serverFinal(bad.finalMessage(sf)))
    assert(e.getMessage.contains("proof verification failed"))
  }

  test("full random-nonce exchange round trips; MITM nonce swap is caught") {
    val salt = new Array[Byte](16)
    new java.util.Random(5).nextBytes(salt)
    val c = new Scram.ClientExchange("alice", "s3cret,=x", Scram.newNonce())
    val s = new Scram.ServerExchange("alice", "s3cret,=x", Scram.newNonce(), salt)
    val sf = s.serverFirst(c.firstMessage)
    c.verifyServerFinal(s.serverFinal(c.finalMessage(sf)))
    // a server-first whose nonce does not extend the client's is refused
    val c2 = new Scram.ClientExchange("alice", "pw", "NONCE-A")
    val e = intercept[IllegalArgumentException](
      c2.finalMessage("r=NONCE-B123,s=" + Base64.getEncoder.encodeToString(salt) + ",i=4096"))
    assert(e.getMessage.contains("nonce"))
  }

  test("malformed client-final tokens are clean IllegalArgumentExceptions, not index errors") {
    val salt = Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val srv = new Scram.ServerExchange("user", "pencil", "%hv", salt, 4096)
    srv.serverFirst("n,,n=user,r=" + cnonce)
    // no proof attribute at all
    val e1 = intercept[IllegalArgumentException](
      srv.serverFinal("c=biws,r=" + cnonce + "%hv"))
    assert(e1.getMessage.contains("proof"))
    // attribute without '='
    val srv2 = new Scram.ServerExchange("user", "pencil", "%hv", salt, 4096)
    srv2.serverFirst("n,,n=user,r=" + cnonce)
    val e2 = intercept[IllegalArgumentException](srv2.serverFinal("garbage"))
    assert(e2.getMessage.contains("malformed"))
  }

  test("saslName escapes ',' and '=' per RFC 5802") {
    assert(Scram.saslName("a=b,c") == "a=3Db=2Cc")
  }

  test("server parses client-first attributes by '=' position; extensions get a clean error") {
    val salt = Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    // a standards-compliant client sending a mandatory extension must
    // see 'mandatory extension not supported', never a misparse
    // cascading into a confusing 'unknown user'
    val srv = new Scram.ServerExchange("user", "pencil", "%hv", salt, 4096)
    val e1 = intercept[IllegalArgumentException](
      srv.serverFirst("n,,m=ext-data,n=user,r=" + cnonce))
    assert(e1.getMessage.contains("mandatory extension"), e1.getMessage)
    // optional unknown extensions are IGNORED (RFC 5802 §5.1: only m=
    // may be rejected; a compliant client sending one must still
    // authenticate)
    val srv2 = new Scram.ServerExchange("user", "pencil", "%hv", salt, 4096)
    assert(srv2.serverFirst("n,,n=user,r=" + cnonce + ",zz=opaque")
      .startsWith("r=" + cnonce))
    // multi-char values with embedded '=' padding still parse (base64
    // salts in other attributes rely on indexOf, not take(1)/drop(2))
    val srv3 = new Scram.ServerExchange("user", "pencil", "%hv", salt, 4096)
    assert(srv3.serverFirst("n,,n=user,r=" + cnonce).startsWith("r=" + cnonce))
  }

  test("client refuses a CPU-exhaustion iteration count from a hostile server") {
    val salt = Base64.getEncoder.encodeToString(
      Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ=="))
    val c = new Scram.ClientExchange("user", "pencil", cnonce)
    val e = intercept[IllegalArgumentException](
      c.finalMessage(s"r=$cnonce%x,s=$salt,i=2147483647"))
    assert(e.getMessage.contains("2147483647") && e.getMessage.contains("4096"), e.getMessage)
    // one over the cap also names the cap; realistic counts (the 4096
    // vector test above) pass — running PBKDF2 at the cap itself would
    // burn seconds of test time for no additional coverage
    val c2 = new Scram.ClientExchange("user", "pencil", cnonce)
    val e2 = intercept[IllegalArgumentException](
      c2.finalMessage(s"r=$cnonce%x,s=$salt,i=${Scram.MaxIterations + 1}"))
    assert(e2.getMessage.contains(Scram.MaxIterations.toString))
  }
}
