/* Reference-architecture benchmark: MCRaT's serial per-event transport loop.
 *
 * The upstream MCRaT cannot be compiled in this environment (no GSL/HDF5/MPI
 * development headers), so this standalone C program reproduces its
 * computational structure from the structural analysis (SURVEY.md 3.1):
 * per scattering event, the reference
 *   1. recomputes every photon's cell membership and optical-depth rate
 *      (findContainingHydroCell + calculateOpticalDepth),
 *   2. samples every photon's exponential free path and reverse-sorts the
 *      candidate list (calcMeanFreePath, O(N log N) qsort),
 *   3. advances all photons to the smallest candidate time and scatters that
 *      one photon: Maxwell-Juttner or Maxwell-Boltzmann electron draw,
 *      electron-rest-frame boost, Klein-Nishina rejection sampling of the
 *      scattering angles, Compton shift, de-boost (photonEvent/singleScatter).
 *
 * The physics formulas are the published ones (KN cross section, MJ sampling,
 * Lorentz boosts); no reference source is copied.  The problem is the same
 * uniform cylindrical-outflow frame as bench.py: Gamma=100, T'=1e5 K,
 * rho'=3e-7 g/cm^3, photons injected as a comoving blackbody, transported for
 * one 0.2 s frame window.
 *
 * Build: gcc -O3 -march=native -o reference_bench reference_bench.c -lm
 * Run:   ./reference_bench [n_photons]   (prints one JSON line)
 */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

static const double C_LIGHT = 2.99792458e10;
static const double K_B = 1.380658e-16;
static const double M_P = 1.6726231e-24;
static const double M_EL = 9.1093879e-28;
static const double THOM_X_SECT = 6.65246e-25;
static const double PL_CONST = 6.6260755e-27;

/* xoshiro256+ PRNG (public-domain algorithm) */
static uint64_t rng_s[4];
static inline uint64_t rotl(const uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
static uint64_t rng_next(void) {
    const uint64_t result = rng_s[0] + rng_s[3];
    const uint64_t t = rng_s[1] << 17;
    rng_s[2] ^= rng_s[0]; rng_s[3] ^= rng_s[1]; rng_s[1] ^= rng_s[2]; rng_s[0] ^= rng_s[3];
    rng_s[2] ^= t; rng_s[3] = rotl(rng_s[3], 45);
    return result;
}
static double urand(void) { return (rng_next() >> 11) * 0x1.0p-53; }
static double urand_pos(void) { double u; do { u = urand(); } while (u <= 0.0); return u; }
static double nrand(void) { /* Box-Muller */
    double u1 = urand_pos(), u2 = urand();
    return sqrt(-2.0 * log(u1)) * cos(2.0 * M_PI * u2);
}

typedef struct {
    double p[4];      /* lab four-momentum, units m_e c */
    double comv_p[4]; /* comoving four-momentum */
    double x[3];      /* position [cm] */
    double t_scatt;   /* candidate time to next scattering [s] */
    double rate;      /* tau per cm */
    int n_scatt;
} photon;

/* flow config: uniform cylindrical outflow (analytic_outflows cylindricalPrep
 * parameter values: Gamma=100, T'=1e5 K, rho'=3e-7) */
static const double GAMMA_FLOW = 100.0;
static const double T_COMV = 1e5;
static const double RHO_COMV = 3e-7;

static void flow_beta(const double x[3], double beta[3]) {
    (void)x;
    double b = sqrt(1.0 - 1.0 / (GAMMA_FLOW * GAMMA_FLOW));
    beta[0] = 0.0; beta[1] = 0.0; beta[2] = b; /* along +z */
}

static void lorentz_boost(const double beta[3], const double p[4], double out[4], int photon_norm) {
    double b2 = beta[0]*beta[0] + beta[1]*beta[1] + beta[2]*beta[2];
    if (b2 <= 0.0) { memcpy(out, p, 4 * sizeof(double)); return; }
    double gamma = 1.0 / sqrt(1.0 - b2);
    double bdotp = beta[0]*p[1] + beta[1]*p[2] + beta[2]*p[3];
    out[0] = gamma * (p[0] - bdotp);
    double coef = (gamma - 1.0) * bdotp / b2 - gamma * p[0];
    for (int i = 0; i < 3; i++) out[i + 1] = p[i + 1] + coef * beta[i];
    if (photon_norm) {
        double n = sqrt(out[1]*out[1] + out[2]*out[2] + out[3]*out[3]);
        if (n > 0) for (int i = 1; i < 4; i++) out[i] *= out[0] / n;
    }
}

static double kn_cross_section(double e) {
    if (e < 1e-3) return 1.0 - 2.0 * e;
    return 0.75 * (2.0 / (e * e)
        + (1.0 / (2.0 * e) - (1.0 + e) / (e * e * e)) * log(1.0 + 2.0 * e)
        + (1.0 + e) / ((1.0 + 2.0 * e) * (1.0 + 2.0 * e)));
}

/* thermal electron draw: three Gaussians below 1e7 K (this benchmark's flow
 * is at T' = 1e5 K so the non-relativistic branch is the hot path) */
static void sample_electron(double temp, const double ph_dir[3], double el[4]) {
    double sigma = sqrt(K_B * temp / M_EL) / C_LIGHT;
    double v[3] = { sigma * nrand(), sigma * nrand(), sigma * nrand() };
    double v2 = v[0]*v[0] + v[1]*v[1] + v[2]*v[2];
    double gamma = 1.0 / sqrt(1.0 - v2);
    (void)ph_dir;
    el[0] = gamma;
    for (int i = 0; i < 3; i++) el[i + 1] = gamma * v[i];
}

/* KN scattering in the electron rest frame (rejection sampling of cos theta) */
static int kn_scatter(double el[4], double ph[4]) {
    double el_v[3] = { el[1] / el[0], el[2] / el[0], el[3] / el[0] };
    double pr[4];
    lorentz_boost(el_v, ph, pr, 1);
    double e0 = pr[0];
    if (urand() > kn_cross_section(e0)) return 0; /* event rejected */
    /* sample cos theta from the KN differential cross section */
    double c, y, f, m;
    do {
        c = 2.0 * urand() - 1.0;
        y = 2.0 * urand();
        m = 1.0 + e0 * (1.0 - c);
        f = (e0 * (1.0 - c) + 1.0 / m + c * c) / (m * m);
    } while (y > f);
    double phi = 2.0 * M_PI * urand();
    double e1 = e0 / (1.0 + e0 * (1.0 - c));
    /* build scattered direction about the incident direction */
    double d[3] = { pr[1] / pr[0], pr[2] / pr[0], pr[3] / pr[0] };
    /* orthonormal frame (a, b, d) */
    double a[3], b[3];
    if (fabs(d[2]) < 0.9) { a[0] = -d[1]; a[1] = d[0]; a[2] = 0.0; }
    else { a[0] = 0.0; a[1] = -d[2]; a[2] = d[1]; }
    double an = sqrt(a[0]*a[0] + a[1]*a[1] + a[2]*a[2]);
    for (int i = 0; i < 3; i++) a[i] /= an;
    b[0] = d[1]*a[2] - d[2]*a[1];
    b[1] = d[2]*a[0] - d[0]*a[2];
    b[2] = d[0]*a[1] - d[1]*a[0];
    double st = sqrt(fmax(1.0 - c * c, 0.0));
    double nd[3];
    for (int i = 0; i < 3; i++)
        nd[i] = c * d[i] + st * (cos(phi) * a[i] + sin(phi) * b[i]);
    pr[0] = e1;
    for (int i = 0; i < 3; i++) pr[i + 1] = e1 * nd[i];
    double neg[3] = { -el_v[0], -el_v[1], -el_v[2] };
    lorentz_boost(neg, pr, ph, 1);
    return 1;
}

/* sort support: reverse sort of candidate indexes by time (qsort_r-free) */
static photon *g_ph;
static int cmp_time(const void *pa, const void *pb) {
    double ta = g_ph[*(const int *)pa].t_scatt, tb = g_ph[*(const int *)pb].t_scatt;
    return (ta > tb) - (ta < tb);
}

int main(int argc, char **argv) {
    int n = argc > 1 ? atoi(argv[1]) : 20000;
    long max_events = argc > 2 ? atol(argv[2]) : -1; /* cap for timing runs */
    double dt_max = 0.2; /* one frame at 5 fps */
    rng_s[0] = 0x123456789abcdefULL; rng_s[1] = 0xfedcba987654321ULL;
    rng_s[2] = 0xdeadbeefcafef00dULL; rng_s[3] = 0x1ULL;

    photon *ph = calloc(n, sizeof(photon));
    int *order = malloc(n * sizeof(int));
    g_ph = ph;

    /* inject: comoving blackbody-ish energies, isotropic comoving, boosted */
    double theta_e = K_B * T_COMV / (M_EL * C_LIGHT * C_LIGHT);
    double beta[3];
    for (int i = 0; i < n; i++) {
        double e = theta_e * (-log(urand_pos() * urand_pos() * urand_pos()));
        double mu = 2.0 * urand() - 1.0, phi = 2.0 * M_PI * urand();
        double s = sqrt(1.0 - mu * mu);
        double pc[4] = { e, e * s * cos(phi), e * s * sin(phi), e * mu };
        memcpy(ph[i].comv_p, pc, sizeof(pc));
        flow_beta(ph[i].x, beta);
        double nb[3] = { -beta[0], -beta[1], -beta[2] };
        lorentz_boost(nb, pc, ph[i].p, 1);
        double r = 2e12, th = urand() * 0.05, az = urand() * 2 * M_PI;
        ph[i].x[0] = r * sin(th) * cos(az);
        ph[i].x[1] = r * sin(th) * sin(az);
        ph[i].x[2] = r * cos(th);
    }

    double n_e_lab = GAMMA_FLOW * RHO_COMV / M_P;
    double beta_mag = sqrt(1.0 - 1.0 / (GAMMA_FLOW * GAMMA_FLOW));

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    long n_events = 0;
    double time_now = 0.0;

    /* the reference per-event loop: O(N) rate recompute + O(N log N) sort per
     * event, advance everyone, scatter one (SURVEY.md 3.1 hot loop) */
    while (time_now < dt_max) {
        for (int i = 0; i < n; i++) {
            flow_beta(ph[i].x, beta);
            double pn = sqrt(ph[i].p[1]*ph[i].p[1] + ph[i].p[2]*ph[i].p[2] + ph[i].p[3]*ph[i].p[3]);
            double mu = (beta[0]*ph[i].p[1] + beta[1]*ph[i].p[2] + beta[2]*ph[i].p[3]) / (beta_mag * pn);
            ph[i].rate = n_e_lab * THOM_X_SECT * (1.0 - beta_mag * mu);
            ph[i].t_scatt = -log(urand_pos()) / (ph[i].rate * C_LIGHT);
            order[i] = i;
        }
        qsort(order, n, sizeof(int), cmp_time);

        int idx = -1;
        int k = 0;
        double t_cand = ph[order[0]].t_scatt;
        if (time_now + t_cand >= dt_max) {
            double dt = dt_max - time_now;
            for (int i = 0; i < n; i++)
                for (int j = 0; j < 3; j++)
                    ph[i].x[j] += ph[i].p[j + 1] / ph[i].p[0] * C_LIGHT * dt;
            break;
        }
        /* walk candidates until one actually scatters (KN rejection = try
         * the next candidate, like photonEvent's i++ walk) */
        double consumed = 0.0;
        for (k = 0; k < n; k++) {
            idx = order[k];
            double dt = ph[idx].t_scatt - consumed;
            if (time_now + ph[idx].t_scatt >= dt_max) { idx = -1; break; }
            for (int i = 0; i < n; i++)
                for (int j = 0; j < 3; j++)
                    ph[i].x[j] += ph[i].p[j + 1] / ph[i].p[0] * C_LIGHT * dt;
            consumed = ph[idx].t_scatt;
            flow_beta(ph[idx].x, beta);
            double comv[4];
            lorentz_boost(beta, ph[idx].p, comv, 1);
            double el[4];
            sample_electron(T_COMV, NULL, el);
            if (kn_scatter(el, comv)) {
                double nb[3] = { -beta[0], -beta[1], -beta[2] };
                lorentz_boost(nb, comv, ph[idx].p, 1);
                memcpy(ph[idx].comv_p, comv, sizeof(comv));
                ph[idx].n_scatt++;
                n_events++;
                break;
            }
        }
        time_now += consumed;
        if (idx < 0 && k == 0) break;
        if (max_events > 0 && n_events >= max_events) break;
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double el = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    printf("{\"metric\": \"reference_architecture_scatterings_per_sec\", "
           "\"value\": %.1f, \"n_photons\": %d, \"n_events\": %ld, \"elapsed_s\": %.3f}\n",
           n_events / el, n, n_events, el);
    free(ph); free(order);
    return 0;
}
