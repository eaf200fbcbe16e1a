"""`python -m aosx.native.build` - compile the native runtime library."""

from .binding import available, build

if __name__ == "__main__":
    ok = build(verbose=True)
    print("native build:", "ok" if ok else "FAILED", "| available:", available())
