"""Minimal serial mpi4py stand-in so the READ-ONLY reference (pauxy) can run
single-process as a validation oracle in this image (which has no MPI).

Only what pauxy touches in a serial run is implemented; collective ops are
identity, point-to-point send/recv go through an in-process mailbox keyed by
tag (pauxy's comb/pair_branch use matching tags, handler.py:301-327).
"""

rc = type("rc", (), {"recv_mprobe": False})()


class _Request:
    def wait(self):
        pass


class _Win:
    @staticmethod
    def Allocate_shared(*a, **kw):
        # pauxy falls back to plain numpy arrays on AttributeError
        # (utils/mpi.py:21-35).
        raise AttributeError("no shared memory in serial oracle")


class _Comm:
    rank = 0
    size = 1

    def __init__(self):
        self._mailbox = {}

    def Get_rank(self):
        return 0

    def Get_size(self):
        return 1

    # --- collectives (serial: identity) ---
    def Barrier(self):
        pass

    barrier = Barrier

    def bcast(self, obj, root=0):
        return obj

    def Bcast(self, buf, root=0):
        pass

    def Reduce(self, send, recv, op=None, root=0):
        recv[:] = send

    def Allreduce(self, send, recv, op=None):
        recv[:] = send

    def allreduce(self, val, op=None):
        return val

    def Allgather(self, send, recv):
        recv[:] = send

    def gather(self, obj, root=0):
        return [obj]

    def Gather(self, send, recv, root=0):
        recv[:] = send

    def scatter(self, objs, root=0):
        return objs[0]

    def Scatter(self, send, recv, root=0):
        recv[:] = send[0]

    # --- point-to-point via tag-keyed mailbox ---
    def Isend(self, buf, dest=0, tag=0):
        import numpy as np

        self._mailbox[tag] = np.array(buf, copy=True)
        return _Request()

    isend = Isend

    def Send(self, buf, dest=0, tag=0):
        self.Isend(buf, dest, tag)

    def Recv(self, buf, source=0, tag=0):
        buf[:] = self._mailbox.pop(tag)

    def recv(self, source=0, tag=0):
        return self._mailbox.pop(tag)

    def Split_type(self, split_type=0, key=0):
        return self

    def Split(self, color=0, key=0):
        return self

    def Abort(self, errorcode=0):
        raise SystemExit(errorcode)


class _MPI:
    COMM_WORLD = _Comm()
    COMM_TYPE_SHARED = 0
    SUM = "sum"
    DOUBLE = "d"
    Win = _Win
    INT = "i"


MPI = _MPI()
