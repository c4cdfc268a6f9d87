// One-time search tool (driver-side, NOT part of the library): finds two
// distinct digit-strings whose 60-bit portable fingerprints collide,
//   fp(s) = first 15 hex chars of md5("0:" + s)  (= portableHash seed 0;
// digit strings are fixed points of TextFunctions.normalize).
// Method: parallel Pollard-rho with distinguished points (van
// Oorschot–Wiener). Expected ~2^30 md5s to a birthday collision on 60
// bits; ~64 s single-thread, seconds across threads.
// Usage: javac FindFpCollision.java && java -cp . FindFpCollision
// The pair it printed is hardcoded in DedupSpec ("60-bit fingerprint
// collision" case) with a verifying assert — the spec re-derives both
// fingerprints, so the tool never needs to run again.
import java.security.MessageDigest;
import java.util.concurrent.ConcurrentHashMap;

public class FindFpCollision {
    static final int DIST_BITS = 18; // distinguished point: low 18 bits zero

    static long fp(MessageDigest md, String s) throws Exception {
        md.reset();
        byte[] d = md.digest(("0:" + s).getBytes("UTF-8"));
        long first8 = 0;
        for (int i = 0; i < 8; i++) first8 = (first8 << 8) | (d[i] & 0xffL);
        return first8 >>> 4;
    }

    // walk step: next input is the decimal rendering of the current fp
    static long step(MessageDigest md, long x) throws Exception {
        return fp(md, Long.toString(x));
    }

    record Seg(long seed, long len) {}

    public static void main(String[] args) throws Exception {
        ConcurrentHashMap<Long, Seg> points = new ConcurrentHashMap<>();
        final Object done = new Object();
        final String[] result = new String[2];
        int n = Runtime.getRuntime().availableProcessors();
        Thread[] ts = new Thread[n];
        for (int t = 0; t < n; t++) {
            final long tid = t;
            ts[t] = new Thread(() -> {
                try {
                    MessageDigest md = MessageDigest.getInstance("MD5");
                    java.util.Random rnd = new java.util.Random(42 + tid);
                    while (result[0] == null) {
                        long seed = rnd.nextLong() >>> 4; // 60-bit start
                        long x = seed, len = 0;
                        while (true) {
                            x = step(md, x); len++;
                            if ((x & ((1L << DIST_BITS) - 1)) == 0) {
                                Seg prev = points.putIfAbsent(x, new Seg(seed, len));
                                if (prev != null && prev.seed() != seed) {
                                    // replay both segments to the collision point
                                    long a = prev.seed(), la = prev.len();
                                    long b = seed, lb = len;
                                    // align lengths
                                    while (la > lb) { a = step(md, a); la--; }
                                    while (lb > la) { b = step(md, b); lb--; }
                                    if (a == b) break; // robin-hood: same walk, retry
                                    while (true) {
                                        long na = step(md, a), nb = step(md, b);
                                        if (na == nb) {
                                            synchronized (done) {
                                                if (result[0] == null) {
                                                    result[0] = Long.toString(a);
                                                    result[1] = Long.toString(b);
                                                }
                                            }
                                            break;
                                        }
                                        a = na; b = nb;
                                    }
                                }
                                break; // start a fresh walk from a new seed
                            }
                            if (len > (1L << 24)) break; // cycle guard
                        }
                    }
                } catch (Exception e) { throw new RuntimeException(e); }
            });
            ts[t].start();
        }
        for (Thread th : ts) th.join();
        MessageDigest md = MessageDigest.getInstance("MD5");
        System.out.println("a = \"" + result[0] + "\"  fp=" + fp(md, result[0]));
        System.out.println("b = \"" + result[1] + "\"  fp=" + fp(md, result[1]));
        if (!result[0].equals(result[1]) && fp(md, result[0]) == fp(md, result[1]))
            System.out.println("COLLISION CONFIRMED");
    }
}
