"""Live microphone demo client (reference: inference/live_demo_client/):
microphone -> WebSocket -> terminal partial/final rendering.

Requires pyaudio (not bundled); fails with instructions if missing.

Run: python -m caiman_asr_tpu.inference.live_client --uri ws://host:port/asr/v0.1/stream
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys

from caiman_asr_tpu.inference.transcriber import QUERY, SUBPROTOCOL

CHUNK_SECONDS = 0.1
RATE = 16000


def render(final_text: str, partial_text: str):
    """Terminal line rendering: finals accumulate, partials overwrite
    (reference live_demo_client/stack.py)."""
    sys.stdout.write("\r\x1b[2K" + final_text + "\x1b[2m" + partial_text + "\x1b[0m")
    sys.stdout.flush()


async def run(uri: str):
    try:
        import pyaudio
    except ImportError:
        raise SystemExit(
            "pyaudio is required for the live demo client: pip install pyaudio"
        )
    import websockets.asyncio.client

    pa = pyaudio.PyAudio()
    stream = pa.open(
        format=pyaudio.paInt16, channels=1, rate=RATE, input=True,
        frames_per_buffer=int(RATE * CHUNK_SECONDS),
    )
    final_text = ""
    async with websockets.asyncio.client.connect(
        f"{uri}?{QUERY}", subprotocols=[SUBPROTOCOL]
    ) as ws:

        async def send():
            loop = asyncio.get_event_loop()
            while True:
                data = await loop.run_in_executor(
                    None, stream.read, int(RATE * CHUNK_SECONDS)
                )
                await ws.send(data)

        send_task = asyncio.create_task(send())
        try:
            async for message in ws:
                r = json.loads(message)
                text = r["alternatives"][0]["transcript"] if r["alternatives"] else ""
                if r.get("is_provisional"):
                    render(final_text, text)
                else:
                    final_text += text
                    render(final_text, "")
        finally:
            send_task.cancel()
            stream.close()
            pa.terminate()


def main(argv=None):
    p = argparse.ArgumentParser(description="live microphone transcription")
    p.add_argument("--uri", default="ws://localhost:8765/asr/v0.1/stream")
    args = p.parse_args(argv)
    asyncio.run(run(args.uri))


if __name__ == "__main__":
    main()
