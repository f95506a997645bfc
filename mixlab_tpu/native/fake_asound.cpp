// Fake libasound for testing the ALSA output backend (io_host/alsa_out.py)
// on machines with no sound stack.  Implements exactly the API subset the
// backend uses, records every call to $FAKE_ASOUND_LOG (text, one line per
// call) and the raw interleaved PCM to $FAKE_ASOUND_LOG.pcm, and can inject
// an underrun: if $FAKE_ASOUND_EPIPE_AT = k, the k-th snd_pcm_writei (0-based,
// counting only non-silence data writes is NOT attempted — all writes count)
// returns -EPIPE so the test can assert the recover + silence-backoff path.
//
// Build: g++ -O2 -shared -fPIC -o libfake_asound.so fake_asound.cpp

#include <cerrno>
#include <cstdarg>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

FILE* log_file() {
    static FILE* f = [] {
        const char* p = std::getenv("FAKE_ASOUND_LOG");
        return p ? std::fopen(p, "a") : nullptr;
    }();
    return f;
}

FILE* pcm_file() {
    static FILE* f = [] {
        const char* p = std::getenv("FAKE_ASOUND_LOG");
        if (!p) return static_cast<FILE*>(nullptr);
        char buf[4096];
        std::snprintf(buf, sizeof(buf), "%s.pcm", p);
        return std::fopen(buf, "ab");
    }();
    return f;
}

void logf(const char* fmt, ...) {
    FILE* f = log_file();
    if (!f) return;
    va_list ap;
    va_start(ap, fmt);
    std::vfprintf(f, fmt, ap);
    va_end(ap);
    std::fputc('\n', f);
    std::fflush(f);
}

struct FakePcm {
    unsigned channels = 2;
    unsigned rate = 0;
    long write_count = 0;
};

long epipe_at() {
    const char* p = std::getenv("FAKE_ASOUND_EPIPE_AT");
    return p ? std::atol(p) : -1;
}

// if set, the k-th writei accepts only half the frames (short write)
long short_at() {
    const char* p = std::getenv("FAKE_ASOUND_SHORT_AT");
    return p ? std::atol(p) : -1;
}

}  // namespace

extern "C" {

int snd_pcm_open(void** pcm, const char* name, int stream, int mode) {
    logf("open %s stream=%d mode=%d", name, stream, mode);
    *pcm = new FakePcm();
    return 0;
}

int snd_pcm_set_params(void* pcm, int format, int access, unsigned channels,
                       unsigned rate, int soft_resample, unsigned latency) {
    auto* p = static_cast<FakePcm*>(pcm);
    p->channels = channels;
    p->rate = rate;
    logf("set_params fmt=%d access=%d ch=%u rate=%u resample=%d latency=%u",
         format, access, channels, rate, soft_resample, latency);
    return 0;
}

long snd_pcm_writei(void* pcm, const void* buf, unsigned long frames) {
    auto* p = static_cast<FakePcm*>(pcm);
    const long idx = p->write_count++;
    if (idx == epipe_at()) {
        logf("writei %lu -> -EPIPE", frames);
        return -EPIPE;
    }
    if (idx == short_at() && frames > 1) {
        const unsigned long half = frames / 2;
        logf("writei %lu -> short %lu", frames, half);
        FILE* f = pcm_file();
        if (f) {
            std::fwrite(buf, 2 * p->channels, half, f);
            std::fflush(f);
        }
        return static_cast<long>(half);
    }
    logf("writei %lu", frames);
    FILE* f = pcm_file();
    if (f) {
        std::fwrite(buf, 2 * p->channels, frames, f);
        std::fflush(f);
    }
    return static_cast<long>(frames);
}

int snd_pcm_recover(void* pcm, int err, int silent) {
    (void)pcm;
    logf("recover err=%d silent=%d", err, silent);
    return 0;
}

int snd_pcm_drain(void* pcm) {
    (void)pcm;
    logf("drain");
    return 0;
}

int snd_pcm_close(void* pcm) {
    logf("close");
    delete static_cast<FakePcm*>(pcm);
    return 0;
}

// ---- device-name hints (enumeration) --------------------------------------
// Two playback PCMs ("default", "null") and one capture-only ("mic") that
// the backend must filter out via IOID == "Input".

namespace {
struct Hint {
    const char* name;
    const char* ioid;  // nullptr = both directions
};
const Hint kHints[] = {{"default", nullptr}, {"null", nullptr},
                       {"mic", "Input"}};
}  // namespace

int snd_device_name_hint(int card, const char* iface, void*** hints) {
    logf("name_hint card=%d iface=%s", card, iface);
    void** arr = static_cast<void**>(std::calloc(4, sizeof(void*)));
    for (int i = 0; i < 3; i++) {
        arr[i] = const_cast<Hint*>(&kHints[i]);
    }
    arr[3] = nullptr;
    *hints = arr;
    return 0;
}

char* snd_device_name_get_hint(const void* hint, const char* id) {
    const auto* h = static_cast<const Hint*>(hint);
    const char* v = nullptr;
    if (std::strcmp(id, "NAME") == 0) v = h->name;
    if (std::strcmp(id, "IOID") == 0) v = h->ioid;
    return v ? strdup(v) : nullptr;
}

int snd_device_name_free_hint(void** hints) {
    std::free(hints);
    return 0;
}

}  // extern "C"
