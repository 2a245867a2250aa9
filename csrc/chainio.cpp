// Native chain-file row formatter for ptmcmcsampler_tpu.
//
// Produces byte-identical output to the reference's Python formatting
// (PTMCMCSampler.py:741-745): ndim columns of "%22.22f" joined by tabs,
// followed by "\t%f\t%f\t%f\t%f\n" for lnprob, lnlike, acceptance rate and
// PT acceptance rate. snprintf with the same format strings guarantees the
// same glibc double formatting the CPython interpreter uses.
//
// Build: g++ -O3 -shared -fPIC -o libchainio.so chainio.cpp

#include <cstdio>
#include <cstring>

extern "C" {

// Returns bytes written, or -1 if the buffer is too small.
long long ptmcmc_format_rows(const double* params, const double* lnprob,
                             const double* lnlike, const double* accept,
                             const double* pt_accept, long long n,
                             long long ndim, char* out, long long cap) {
  long long pos = 0;
  for (long long i = 0; i < n; ++i) {
    const double* row = params + i * ndim;
    for (long long k = 0; k < ndim; ++k) {
      if (cap - pos < 384) return -1;
      int w = snprintf(out + pos, (size_t)(cap - pos), k ? "\t%22.22f" : "%22.22f",
                       row[k]);
      if (w < 0) return -1;
      pos += w;
    }
    if (cap - pos < 256) return -1;
    int w = snprintf(out + pos, (size_t)(cap - pos), "\t%f\t%f\t%f\t%f\n",
                     lnprob[i], lnlike[i], accept[i], pt_accept[i]);
    if (w < 0) return -1;
    pos += w;
  }
  return pos;
}

}  // extern "C"
