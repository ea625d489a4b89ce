#define _GNU_SOURCE
#include <stddef.h>
#include <string.h>
#include <stdio.h>
#include <unistd.h>
#include <fcntl.h>
#include <stdlib.h>
extern void *__libc_malloc(size_t);
extern void *__libc_calloc(size_t, size_t);
extern void *__libc_realloc(void *, size_t);
extern void __libc_free(void *);
static int fd = -1;
static void logln(const char *tag, void *p, size_t n) {
    if (fd == -1) {
        const char *path = getenv("MTRACE_OUT");
        fd = open(path ? path : "/tmp/mtrace/out.log",
                  O_WRONLY | O_CREAT | O_APPEND, 0644);
    }
    char buf[64];
    int k = snprintf(buf, sizeof buf, "%s %p %zu\n", tag, p, n);
    if (k > 0) write(fd, buf, k);
}
void *malloc(size_t n) {
    void *p = __libc_malloc(n);
    if (p) memset(p, 0, n);
    logln("m", p, n);
    return p;
}
void *calloc(size_t a, size_t b) {
    void *p = __libc_calloc(a, b);
    logln("c", p, a * b);
    return p;
}
void *realloc(void *q, size_t n) {
    void *p = __libc_realloc(q, n);
    logln("r", p, n);
    return p;
}
void free(void *p) { logln("f", p, 0); __libc_free(p); }
