"""Async variant of the streaming example (reference's tokio-style API:
Transcriber::spawn / handle.start / receiver.recv)."""

import asyncio

from norma_tpu import NoStreamRunning, Transcriber
from norma_tpu.input import Settings
from norma_tpu.models import SelectedDevice
from norma_tpu.models.whisper import monolingual


async def main() -> None:
    definition = monolingual.Definition(
        monolingual.ModelType.DISTIL_LARGE_EN_V3, SelectedDevice.auto()
    )

    jh, th = await Transcriber.spawn(definition)
    stream = await th.start(Settings())

    async def printer() -> None:
        while (seg := await stream.recv()) is not None:
            print(seg, flush=True)

    task = asyncio.create_task(printer())
    await asyncio.sleep(10)
    try:
        th.stop()
    except NoStreamRunning:
        pass  # the stream already ended on its own (mic failure/EOF)
    th.close()
    await task
    jh.join()


if __name__ == "__main__":
    asyncio.run(main())
